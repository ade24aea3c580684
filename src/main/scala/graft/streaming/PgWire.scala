package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Logical-replication WIRE protocol — SURVEY.md §2.A2's socket half.
  *
  * pg2ch's consumer loop speaks PostgreSQL streaming replication: it
  * opens a replication connection, issues `START_REPLICATION SLOT …
  * LOGICAL <lsn>`, then enters CopyBoth mode where the server streams
  * `XLogData ('w')` submessages carrying pgoutput frames and periodic
  * `Primary keepalive ('k')` messages, and the client answers with
  * `Standby status update ('r')` messages whose FLUSHED LSN is the
  * server's permission to discard WAL — acked only after the sink has
  * durably applied the data (`pkg/consumer` [recall:med]; the
  * submessage grammar is the public PG protocol documentation's).
  *
  * This module implements that message layer and the client loop
  * faithfully; the PQ startup handshake (auth/SSL) is simplified to a
  * single text line, honestly marked — this environment has no
  * PostgreSQL, so the peer is a protocol-faithful stub
  * (StubPgWire, tests), exactly the StubCH arrangement on the sink
  * side. Everything that makes replication CORRECT — LSN-ordered
  * delivery, flush-after-durable ack, keepalive reply, restart from
  * the acked LSN with no gaps or duplicates — is real here and
  * spec-tested (PgWireSpec).
  *
  * Message framing (CopyData-shaped): every message is
  * `len:int32 body`, big-endian, `len` counting the body only.
  * {{{
  *   body 'w' := startLsn:int64 endLsn:int64 clock:int64 payload
  *               (payload = one PgOutput binary frame)
  *   body 'k' := endLsn:int64 clock:int64 replyRequested:byte
  *   body 'r' := writtenLsn:int64 flushedLsn:int64 appliedLsn:int64
  *               clock:int64 replyRequested:byte
  * }}}
  */
object PgWire {

  final case class XLogData(startLsn: Long, endLsn: Long, clock: Long,
                            payload: Array[Byte])
  final case class Keepalive(endLsn: Long, clock: Long, replyRequested: Boolean)
  final case class StandbyStatus(written: Long, flushed: Long, applied: Long,
                                 clock: Long, replyRequested: Boolean)

  def writeMsg(out: DataOutputStream, body: Array[Byte]): Unit = {
    out.writeInt(body.length)
    out.write(body)
    out.flush()
  }

  /** Reads one length-prefixed message; length is bounded so a corrupt
    * peer cannot force a giant allocation.
    */
  def readMsg(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    require(n >= 1 && n <= (1 << 26), s"message length $n out of range")
    val b = new Array[Byte](n)
    in.readFully(b)
    b
  }

  def encodeXLogData(d: XLogData): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 24 + d.payload.length)
    b.put('w'.toByte).putLong(d.startLsn).putLong(d.endLsn).putLong(d.clock)
      .put(d.payload)
    b.array()
  }

  def encodeKeepalive(k: Keepalive): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 17)
    b.put('k'.toByte).putLong(k.endLsn).putLong(k.clock)
      .put(if (k.replyRequested) 1.toByte else 0.toByte)
    b.array()
  }

  def encodeStandbyStatus(s: StandbyStatus): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 33)
    b.put('r'.toByte).putLong(s.written).putLong(s.flushed).putLong(s.applied)
      .putLong(s.clock).put(if (s.replyRequested) 1.toByte else 0.toByte)
    b.array()
  }

  def decodeXLogData(body: Array[Byte]): XLogData = {
    val b = ByteBuffer.wrap(body)
    require(b.get() == 'w'.toByte, "not an XLogData message")
    val start = b.getLong(); val end = b.getLong(); val clock = b.getLong()
    val payload = new Array[Byte](b.remaining())
    b.get(payload)
    XLogData(start, end, clock, payload)
  }

  def decodeKeepalive(body: Array[Byte]): Keepalive = {
    val b = ByteBuffer.wrap(body)
    require(b.get() == 'k'.toByte, "not a keepalive message")
    Keepalive(b.getLong(), b.getLong(), b.get() != 0)
  }

  def decodeStandbyStatus(body: Array[Byte]): StandbyStatus = {
    val b = ByteBuffer.wrap(body)
    require(b.get() == 'r'.toByte, "not a standby status message")
    StandbyStatus(b.getLong(), b.getLong(), b.getLong(), b.getLong(), b.get() != 0)
  }
}

/** The replication-socket CLIENT loop: connect, `START_REPLICATION`
  * after a given LSN, receive XLogData frames, land them DURABLY in the
  * Structured-Streaming feed directory (base64 frame lines — the exact
  * input of [[ChangeFeed.fromBase64Frames]]), and only then ack the
  * flushed LSN via standby status. Crash anywhere: nothing acked that
  * was not durably landed, so a restart from [[lastFlushed]] replays
  * the un-acked tail and nothing else — the same offset-after-sink
  * contract the file feed's checkpoint gives the Spark side.
  *
  * The landing is atomic per batch (temp file + rename), so the file
  * stream never observes a half-written file; batches flush when
  * `batchFrames` accumulate or on any keepalive (the feed stays fresh
  * under trickle load — pg2ch's inactivity flush).
  *
  * @param idleKeepalivesToStop after this many consecutive keepalives
  *        with nothing new and nothing pending, [[run]] returns (the
  *        test-harness form of "caught up"; a production loop passes
  *        Int.MaxValue and is stopped from outside via [[stop]]).
  */
final class PgWireClient(host: String, port: Int, feedDir: String,
                         batchFrames: Int = 64,
                         idleKeepalivesToStop: Int = 2) {

  @volatile private var stopped = false
  @volatile private var flushedLsn = Long.MinValue
  private var fileSeq = 0
  // instance tag for landed-file names: wall-clock nanos at construction
  // — unique across JVM restarts (identityHashCode is not), so a
  // restarted client can never collide with its predecessor's files
  private val instanceTag = java.lang.Long.toHexString(System.nanoTime())

  def lastFlushed: Long = flushedLsn

  def stop(): Unit = { stopped = true }

  /** The feed directory's durable high-water mark: the max LSN any
    * previous client landed (file names carry it). THIS — not the
    * in-memory acked LSN — is the true resume point: a crash between
    * landing and acking leaves frames durably landed but un-acked, and
    * resuming from the acked LSN would replay them into duplicates.
    * Long.MinValue when the directory is empty.
    */
  def landedHighWater(): Long = {
    val dir = java.nio.file.Paths.get(feedDir)
    if (!java.nio.file.Files.isDirectory(dir)) return Long.MinValue
    val it = java.nio.file.Files.list(dir)
    try {
      var hw = Long.MinValue
      it.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("feed_") && n.endsWith(".b64")) {
          val core = n.stripPrefix("feed_").stripSuffix(".b64")
          val last = core.substring(core.lastIndexOf('_') + 1)
          try hw = math.max(hw, last.toLong) catch { case _: NumberFormatException => () }
        }
      }
      hw
    } finally it.close()
  }

  /** Run the consumer loop; returns the last acked (flushed) LSN.
    * Resumes from max(startAfter, [[landedHighWater]]) — the crash
    * window between a durable landing and its ack can therefore never
    * cause a duplicate landing: the restarted client asks the server
    * for frames strictly after what the feed already holds.
    */
  def run(startAfter: Long): Long = {
    flushedLsn = math.max(startAfter, landedHighWater())
    val sock = new Socket(host, port)
    sock.setSoTimeout(30000)
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      out.write(s"START_REPLICATION $flushedLsn\n".getBytes(UTF_8))
      out.flush()
      val pending = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
      var idle = 0
      def ack(): Unit = PgWire.writeMsg(out, PgWire.encodeStandbyStatus(
        PgWire.StandbyStatus(flushedLsn, flushedLsn, flushedLsn,
          System.nanoTime() / 1000, replyRequested = false)))
      def flushAndAck(): Unit = if (pending.nonEmpty) {
        landBatch(pending.toSeq)
        flushedLsn = pending.map(_._1).max
        pending.clear()
        ack()
      }
      while (!stopped && idle < idleKeepalivesToStop) {
        val body = PgWire.readMsg(in)
        body(0).toChar match {
          case 'w' =>
            val d = PgWire.decodeXLogData(body)
            pending += ((d.endLsn, d.payload))
            idle = 0
            if (pending.size >= batchFrames) flushAndAck()
          case 'k' =>
            val k = PgWire.decodeKeepalive(body)
            if (pending.nonEmpty) flushAndAck()
            else if (k.endLsn <= flushedLsn) idle += 1
            else {
              // the server's WAL advanced without data for this feed:
              // release retention up to the keepalive position (nothing
              // is outstanding), or an idle subscription pins WAL at the
              // last data frame forever
              flushedLsn = k.endLsn
              ack()
            }
            if (k.replyRequested) ack()
          case other =>
            throw new IllegalStateException(s"unexpected server message '$other'")
        }
      }
      flushAndAck()
      flushedLsn
    } finally sock.close()
  }

  /** The production loop: [[run]] plus reconnect-with-resume. A dropped
    * socket (server bounce, network blip) is caught, and the next
    * attempt resumes from [[lastFlushed]] — everything acked is durably
    * landed, everything un-acked is replayed by the server, so the feed
    * sees every frame exactly once no matter where the connection died.
    * Backoff is linear (`retryDelayMs · attempt`); gives up after
    * `maxReconnects` consecutive failures (a successful read streak
    * resets the count via the flushed LSN advancing).
    */
  def runWithReconnect(startAfter: Long, maxReconnects: Int = 5,
                       retryDelayMs: Long = 50L): Long = {
    var cursor = startAfter
    var failures = 0
    var done = false
    while (!done && !stopped) {
      val before = cursor
      try {
        cursor = run(cursor)
        done = true
      } catch {
        case _: java.io.IOException | _: java.net.SocketException =>
          cursor = math.max(cursor, lastFlushed)
          failures = if (cursor > before) 1 else failures + 1
          if (failures > maxReconnects)
            throw new java.io.IOException(
              s"replication peer unreachable after $maxReconnects reconnects")
          Thread.sleep(retryDelayMs * failures)
      }
    }
    cursor
  }

  /** Durable, atomic landing of one batch as base64 frame lines —
    * [[ChangeFeed.fromBase64Frames]]'s input format. File names carry
    * (sequence, maxLsn) for operator debugging; the stream source keys
    * on file identity, not name order.
    */
  private def landBatch(frames: Seq[(Long, Array[Byte])]): Unit = {
    val enc = java.util.Base64.getEncoder
    val lines = frames.map { case (_, p) => enc.encodeToString(p) }
      .mkString("", "\n", "\n")
    val dir = java.nio.file.Paths.get(feedDir)
    java.nio.file.Files.createDirectories(dir)
    val maxLsn = frames.map(_._1).max
    val tmp = dir.resolve(s"_tmp_feed_${instanceTag}_${fileSeq}_$maxLsn.b64")
    val dst = dir.resolve(s"feed_${instanceTag}_${fileSeq}_$maxLsn.b64")
    fileSeq += 1
    java.nio.file.Files.write(tmp, lines.getBytes(UTF_8))
    java.nio.file.Files.move(tmp, dst,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
