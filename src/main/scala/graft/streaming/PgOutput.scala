package graft.streaming

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Binary pgoutput-shaped frame codec (SURVEY.md §2.A3).
  *
  * pg2ch's decoder parses the binary pgoutput logical-replication messages
  * `B C R I U D T` — a tag byte, fixed-width big-endian integers, and
  * tuple data whose cells are tagged `n` (null) / `u` (TOAST unchanged) /
  * `t` (text value with an int32 length) (`pkg/decoder/decoder.go`
  * [recall:high] — SURVEY §0: layout from public-repo knowledge, the
  * reference dir is empty). This codec models that wire shape faithfully
  * at the frame level, with one simplification: each frame is prefixed
  * with its int64 LSN (the consumer loop's XLogData header carries it in
  * PG; folding it into the frame keeps one frame == one self-contained
  * binary value, which is how a Kafka/file feed delivers them).
  *
  * Frame grammar (all integers big-endian):
  * {{{
  *   frame   := lsn:int64 tag:byte body
  *   B       := finalLsn:int64 commitTsMicros:int64 xid:int32
  *   C       := flags:byte commitLsn:int64 endLsn:int64 tsMicros:int64
  *   O       := originLsn:int64 name:str16            (replication origin)
  *   R       := relId:int32 name:str16 ncols:int16 (colName:str16)*
  *   Y       := typeOid:int32 namespace:str16 name:str16   (type metadata)
  *   I       := relId:int32 'N' tuple
  *   U       := relId:int32 ['O' tuple] 'N' tuple
  *   D       := relId:int32 'O' tuple
  *   T       := nrels:int32 (relId:int32)*
  *   tuple   := ncols:int16 cell*
  *   cell    := 'n' | 'u' | 't' len:int32 bytes
  *   str16   := len:int16 utf8-bytes
  * }}}
  *
  * `O` (origin) and `Y` (type) frames carry session metadata, no row
  * data — pg2ch reads and skips them, and so does the decode here
  * (they must PARSE, though: treating them as malformed would
  * poison-pill legitimate frames of a real subscription).
  *
  * Values are PG text-format strings (what COPY/pgoutput put on the wire);
  * downstream casts them to the table's Spark types. `u` (TOAST-unchanged)
  * decodes to null — feeds with REPLICA IDENTITY FULL never emit it.
  *
  * The encode half exists for tests and fixtures: this environment has no
  * PostgreSQL, so feeds are synthesized (honestly marked — the parse path
  * is the deliverable).
  */
object PgOutput {

  /** One decoded frame. `tag == null` ⇔ malformed input (poison-pill
    * policy is the caller's choice, exactly like ChangeFeed's JSON path).
    * Tuple cells are null for `n`/`u` markers.
    */
  final case class Frame(
      lsn: Option[Long],
      tag: String,
      relId: Int,
      relName: String,
      colNames: Seq[String],
      before: Seq[String],
      after: Seq[String],
      relIds: Seq[Int])

  private val Malformed = Frame(None, null, -1, null, null, null, null, null)

  // ---------------------------------------------------------------- parse

  /** Total parse: any structural violation (short buffer, unknown tag or
    * cell marker, negative length, trailing bytes) yields the malformed
    * frame — a poison pill never throws into the stream.
    */
  def parse(bytes: Array[Byte]): Frame =
    try {
      val b = ByteBuffer.wrap(bytes)
      val lsn = b.getLong()
      val frame = (b.get().toChar: @unchecked) match {
        case 'B' => b.getLong(); b.getLong(); b.getInt()
          Frame(Some(lsn), "B", -1, null, null, null, null, null)
        case 'C' => b.get(); b.getLong(); b.getLong(); b.getLong()
          Frame(Some(lsn), "C", -1, null, null, null, null, null)
        case 'O' => b.getLong(); str16(b)
          Frame(Some(lsn), "O", -1, null, null, null, null, null)
        case 'Y' => b.getInt(); str16(b); str16(b)
          Frame(Some(lsn), "Y", -1, null, null, null, null, null)
        case 'R' =>
          val relId = b.getInt()
          val name = str16(b)
          val n = b.getShort().toInt
          val cols = (0 until n).map(_ => str16(b))
          Frame(Some(lsn), "R", relId, name, cols, null, null, null)
        case 'I' =>
          val relId = b.getInt()
          expect(b, 'N')
          Frame(Some(lsn), "I", relId, null, null, null, tuple(b), null)
        case 'U' =>
          val relId = b.getInt()
          val marker = b.get().toChar
          val (before, after) = marker match {
            case 'O' => val o = tuple(b); expect(b, 'N'); (o, tuple(b))
            case 'N' => (null, tuple(b))
            case m => throw new IllegalArgumentException(s"bad U marker $m")
          }
          Frame(Some(lsn), "U", relId, null, null, before, after, null)
        case 'D' =>
          val relId = b.getInt()
          expect(b, 'O')
          Frame(Some(lsn), "D", relId, null, null, tuple(b), null, null)
        case 'T' =>
          val n = b.getInt()
          require(n >= 0 && n <= b.remaining() / 4, s"bad truncate count $n")
          Frame(Some(lsn), "T", -1, null, null, null, null,
            (0 until n).map(_ => b.getInt()))
        case t => throw new IllegalArgumentException(s"unknown tag $t")
      }
      require(!b.hasRemaining, s"${b.remaining()} trailing bytes")
      frame
    } catch { case _: Exception => Malformed }

  private def expect(b: ByteBuffer, marker: Char): Unit = {
    val got = b.get().toChar
    require(got == marker, s"expected $marker, got $got")
  }

  private def str16(b: ByteBuffer): String = {
    val len = b.getShort().toInt
    require(len >= 0 && len <= b.remaining(), s"bad string length $len")
    val a = new Array[Byte](len); b.get(a); new String(a, UTF_8)
  }

  private def tuple(b: ByteBuffer): Seq[String] = {
    val n = b.getShort().toInt
    require(n >= 0, s"bad tuple arity $n")
    (0 until n).map { _ =>
      (b.get().toChar: @unchecked) match {
        case 'n' | 'u' => null
        case 't' =>
          val len = b.getInt()
          require(len >= 0 && len <= b.remaining(), s"bad cell length $len")
          val a = new Array[Byte](len); b.get(a); new String(a, UTF_8)
        case m => throw new IllegalArgumentException(s"unknown cell marker $m")
      }
    }
  }

  // --------------------------------------------------------------- encode

  /** Encode into a growable buffer: pgoutput text cells are TOAST-sized
    * in real feeds (well past any fixed buffer), so on overflow the
    * buffer doubles and the body is re-run — fixtures of any row size
    * encode without a size precomputation pass.
    */
  private def frame(lsn: Long, tag: Char)(body: ByteBuffer => Unit): Array[Byte] = {
    var cap = 1 << 16
    while (true) {
      val b = ByteBuffer.allocate(cap)
      try {
        b.putLong(lsn).put(tag.toByte)
        body(b)
        return java.util.Arrays.copyOf(b.array(), b.position())
      } catch { case _: java.nio.BufferOverflowException => cap *= 2 }
    }
    throw new IllegalStateException("unreachable")
  }

  private def putStr16(b: ByteBuffer, s: String): Unit = {
    val a = s.getBytes(UTF_8); b.putShort(a.length.toShort).put(a)
  }

  private def putTuple(b: ByteBuffer, cells: Seq[String]): Unit = {
    b.putShort(cells.length.toShort)
    cells.foreach {
      case null => b.put('n'.toByte)
      case s =>
        val a = s.getBytes(UTF_8)
        b.put('t'.toByte).putInt(a.length).put(a)
    }
  }

  def encodeBegin(lsn: Long, finalLsn: Long, tsMicros: Long, xid: Int): Array[Byte] =
    frame(lsn, 'B')(b => { b.putLong(finalLsn).putLong(tsMicros).putInt(xid); () })

  def encodeCommit(lsn: Long, tsMicros: Long): Array[Byte] =
    frame(lsn, 'C')(b => { b.put(0.toByte).putLong(lsn).putLong(lsn + 1).putLong(tsMicros); () })

  def encodeOrigin(lsn: Long, originLsn: Long, name: String): Array[Byte] =
    frame(lsn, 'O')(b => { b.putLong(originLsn); putStr16(b, name) })

  def encodeType(lsn: Long, typeOid: Int, namespace: String, name: String): Array[Byte] =
    frame(lsn, 'Y') { b =>
      b.putInt(typeOid); putStr16(b, namespace); putStr16(b, name)
    }

  def encodeRelation(lsn: Long, relId: Int, name: String, cols: Seq[String]): Array[Byte] =
    frame(lsn, 'R') { b =>
      b.putInt(relId); putStr16(b, name)
      b.putShort(cols.length.toShort); cols.foreach(putStr16(b, _))
    }

  def encodeInsert(lsn: Long, relId: Int, after: Seq[String]): Array[Byte] =
    frame(lsn, 'I')(b => { b.putInt(relId).put('N'.toByte); putTuple(b, after) })

  def encodeUpdate(lsn: Long, relId: Int, before: Seq[String],
                   after: Seq[String]): Array[Byte] =
    frame(lsn, 'U') { b =>
      b.putInt(relId)
      if (before != null) { b.put('O'.toByte); putTuple(b, before) }
      b.put('N'.toByte); putTuple(b, after)
    }

  def encodeDelete(lsn: Long, relId: Int, before: Seq[String]): Array[Byte] =
    frame(lsn, 'D')(b => { b.putInt(relId).put('O'.toByte); putTuple(b, before) })

  def encodeTruncate(lsn: Long, relIds: Seq[Int]): Array[Byte] =
    frame(lsn, 'T') { b =>
      b.putInt(relIds.length); relIds.foreach(b.putInt)
    }

  /** A TOAST-unchanged (`u`) cell at the given position, for tests. */
  def encodeInsertWithToast(lsn: Long, relId: Int, after: Seq[String],
                            toastAt: Set[Int]): Array[Byte] =
    frame(lsn, 'I') { b =>
      b.putInt(relId).put('N'.toByte)
      b.putShort(after.length.toShort)
      after.zipWithIndex.foreach {
        case (_, i) if toastAt(i) => b.put('u'.toByte)
        case (null, _) => b.put('n'.toByte)
        case (s, _) =>
          val a = s.getBytes(UTF_8)
          b.put('t'.toByte).putInt(a.length).put(a)
      }
    }
}
