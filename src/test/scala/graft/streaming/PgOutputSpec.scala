package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Encoders}

/** A3's real wire shape: binary pgoutput-shaped frames must decode to the
  * SAME change relation as the JSON-lines stand-in, with the same
  * poison-pill policy for malformed input (VERDICT r02 "What's missing" #2).
  */
class PgOutputSpec extends SparkSpec {

  private val Rel = 42

  private def binDf(frames: Seq[Array[Byte]]): DataFrame =
    spark.createDataset(frames)(Encoders.BINARY).toDF("value")

  private def jsonDf(lines: Seq[String]): DataFrame =
    spark.createDataset(lines)(Encoders.STRING).toDF("value")

  private def rows(df: DataFrame): Seq[String] =
    df.select("lsn", "op", "table", "before", "after")
      .collect().map(_.toString).sorted.toSeq

  test("binary feed decodes identically to the JSON-lines feed") {
    // one transaction's worth of change traffic, expressed both ways
    val json = jsonDf(Seq(
      """{"lsn":1,"op":"I","table":"t","after":{"k":1,"v":"a"}}""",
      """{"lsn":2,"op":"U","table":"t","before":{"k":1,"v":"old"},"after":{"k":1,"v":"b"}}""",
      """{"lsn":3,"op":"I","table":"t","after":{"k":2,"v":"x","amt":1.50}}""",
      """{"lsn":4,"op":"D","table":"t","before":{"k":2,"v":"x"}}""",
      """{"lsn":5,"op":"T","table":"t"}""",
      """{"lsn":6,"op":"I","table":"t","after":{"k":3,"v":"z"}}"""))
    val bin = binDf(Seq(
      PgOutput.encodeBegin(0, finalLsn = 7, tsMicros = 1000L, xid = 99),
      PgOutput.encodeRelation(0, Rel, "t", Seq("k", "v", "amt")),
      PgOutput.encodeInsert(1, Rel, Seq("1", "a", null)),
      PgOutput.encodeUpdate(2, Rel, Seq("1", "old", null), Seq("1", "b", null)),
      PgOutput.encodeInsert(3, Rel, Seq("2", "x", "1.50")),
      PgOutput.encodeDelete(4, Rel, Seq("2", "x", null)),
      PgOutput.encodeTruncate(5, Seq(Rel)),
      PgOutput.encodeInsert(6, Rel, Seq("3", "z", null)),
      PgOutput.encodeCommit(7, tsMicros = 2000L)))

    val fromJson = ChangeFeed.fromJsonLines(json, ChangeRelation.testRow)
    val fromBin = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow)
    assert(rows(fromBin) === rows(fromJson))

    // and the CDC apply downstream agrees end-to-end
    val s1 = CdcApply.applyReplacing(fromJson, Seq("k")).collect().map(_.toString).sorted
    val s2 = CdcApply.applyReplacing(fromBin, Seq("k")).collect().map(_.toString).sorted
    assert(s1.toSeq === s2.toSeq)
  }

  test("malformed frames follow the same poison-pill policy as JSON") {
    val good = PgOutput.encodeInsert(1, Rel, Seq("1", "a", null))
    val bad = Seq(
      Array[Byte](1, 2, 3), // short buffer
      PgOutput.encodeInsert(2, Rel, Seq("2", "b", null)).patch(8, Seq('Z'.toByte), 1), // unknown tag
      PgOutput.encodeInsert(3, Rel, Seq("3", "c", null)) ++ Array[Byte](0), // trailing bytes
      Array.empty[Byte])
    val feed = binDf(good +: bad)
    val dropped = ChangeFeed.fromBinaryFrames(feed, ChangeRelation.testRow,
      relations = Map(Rel -> "t"))
    assert(dropped.select("lsn").collect().map(_.getLong(0)).toSeq === Seq(1L))
    val strict = ChangeFeed.fromBinaryFrames(feed, ChangeRelation.testRow,
      dropMalformed = false, relations = Map(Rel -> "t"))
    assert(strict.count() === 5L) // malformed rows visible for fail-fast policies
    assert(strict.filter("op IS NULL").count() === 4L)
  }

  test("truncate expands to one row per relation, resolved by relid") {
    val bin = binDf(Seq(
      PgOutput.encodeRelation(0, 42, "users", Seq("k", "v", "amt")),
      PgOutput.encodeRelation(0, 43, "audit", Seq("k", "v", "amt")),
      PgOutput.encodeTruncate(9, Seq(42, 43))))
    val out = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow)
      .select("lsn", "op", "table").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._3)
    assert(out.toSeq === Seq((9L, "T", "audit"), (9L, "T", "users")))
  }

  test("a later R frame re-maps the relid (latest relation wins)") {
    val bin = binDf(Seq(
      PgOutput.encodeRelation(0, Rel, "t_old", Seq("k", "v", "amt")),
      PgOutput.encodeRelation(5, Rel, "t_new", Seq("k", "v", "amt")),
      PgOutput.encodeInsert(6, Rel, Seq("1", "a", null))))
    val out = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow)
    assert(out.select("table").collect().map(_.getString(0)).toSeq === Seq("t_new"))
  }

  test("toast-unchanged cells decode to null, not a value") {
    val bin = binDf(Seq(
      PgOutput.encodeInsertWithToast(1, Rel, Seq("1", "huge-ignored", null), toastAt = Set(1))))
    val out = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow,
      relations = Map(Rel -> "t"))
    val r = out.select("after.k", "after.v").collect().head
    assert(r.getLong(0) === 1L)
    assert(r.isNullAt(1))
  }

  test("property: arbitrary frames roundtrip encode→parse exactly") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCell: Gen[String] = Gen.oneOf(
      Gen.const(null: String),
      Gen.listOf(Gen.frequency(6 -> Gen.alphaNumChar,
        1 -> Gen.oneOf('\t', '\n', '\\', 'é', '中'))).map(_.mkString))
    val genTuple: Gen[Seq[String]] = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, genCell).map(_.toSeq))
    val genFrame: Gen[(Long, Int, String, Seq[String], Seq[String])] = for {
      lsn <- Gen.chooseNum(0L, Long.MaxValue / 2)
      relId <- Gen.chooseNum(1, 100000)
      op <- Gen.oneOf("I", "U", "D")
      before <- genTuple
      after <- genTuple
    } yield (lsn, relId, op, before, after)
    val prop = Prop.forAllNoShrink(genFrame) { case (lsn, relId, op, before, after) =>
      val bytes = op match {
        case "I" => PgOutput.encodeInsert(lsn, relId, after)
        case "U" => PgOutput.encodeUpdate(lsn, relId, before, after)
        case "D" => PgOutput.encodeDelete(lsn, relId, before)
      }
      val f = PgOutput.parse(bytes)
      f.tag == op && f.lsn.contains(lsn) && f.relId == relId &&
        (op match {
          case "I" => f.after == after && f.before == null
          case "U" => f.after == after && f.before == before
          case "D" => f.before == before && f.after == null
        })
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: corrupted frames never throw, they parse as malformed or valid") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genBytes: Gen[Array[Byte]] = Gen.oneOf(
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray),
      // a valid frame with one flipped byte — near-valid corruption
      Gen.chooseNum(0, 30).map { i =>
        val b = PgOutput.encodeInsert(7, 42, Seq("1", "abc", null))
        if (i < b.length) b.updated(i, (b(i) ^ 0x5a).toByte) else b
      })
    val prop = Prop.forAllNoShrink(genBytes) { bytes =>
      PgOutput.parse(bytes) != null // total: never throws
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("origin (O) and type (Y) metadata frames parse and are skipped, not poisoned") {
    val bin = binDf(Seq(
      PgOutput.encodeOrigin(0, originLsn = 123L, name = "origin_node"),
      PgOutput.encodeType(0, typeOid = 1700, namespace = "pg_catalog", name = "numeric"),
      PgOutput.encodeInsert(1, Rel, Seq("1", "a", null))))
    assert(PgOutput.parse(PgOutput.encodeOrigin(0, 123L, "n")).tag === "O")
    assert(PgOutput.parse(PgOutput.encodeType(0, 1700, "ns", "n")).tag === "Y")
    // the decode keeps the real change row and drops no valid frames
    val out = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow,
      relations = Map(Rel -> "t"))
    assert(out.select("lsn").collect().map(_.getLong(0)).toSeq === Seq(1L))
    // strict mode: metadata frames contribute NO rows (valid ≠ malformed)
    val strict = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow,
      dropMalformed = false, relations = Map(Rel -> "t"))
    assert(strict.count() === 1L)
  }

  test("mid-stream R redefinition: later tuples decode by NAME against the new column order") {
    // first half: (k, v, amt); second half REORDERS to (amt, k, v).
    // Name-based mapping must decode both correctly — positional decode
    // would silently put "b" into k after the redefinition.
    val bin = binDf(Seq(
      PgOutput.encodeRelation(0, Rel, "t", Seq("k", "v", "amt")),
      PgOutput.encodeInsert(1, Rel, Seq("1", "a", "1.00")),
      PgOutput.encodeRelation(5, Rel, "t", Seq("amt", "k", "v")),
      PgOutput.encodeInsert(6, Rel, Seq("2.00", "2", "b"))))
    val out = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow)
      .select("lsn", "after.k", "after.v", "after.amt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDecimal(3).toPlainString)).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 1L, "a", "1.00"), (6L, 2L, "b", "2.00")))
  }

  test("mid-stream column ADD: old tuples null-fill, new tuples carry the column") {
    val bin = binDf(Seq(
      PgOutput.encodeRelation(0, Rel, "t", Seq("k", "v")),
      PgOutput.encodeInsert(1, Rel, Seq("1", "a")), // 2 cells, pre-add
      PgOutput.encodeRelation(5, Rel, "t", Seq("k", "v", "amt")),
      PgOutput.encodeInsert(6, Rel, Seq("2", "b", "9.99")))) // 3 cells
    val out = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow)
      .select("lsn", "after.k", "after.amt").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getDecimal(2)).map(_.toPlainString))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 1L, None), (6L, 2L, Some("9.99"))))
  }

  test("tuple arity disagreeing with the governing definition is poison, not misdecode") {
    val bin = binDf(Seq(
      PgOutput.encodeRelation(0, Rel, "t", Seq("k", "v", "amt")),
      PgOutput.encodeInsert(1, Rel, Seq("1", "a", null)), // aligned
      PgOutput.encodeInsert(2, Rel, Seq("2", "b")))) // 2 cells vs 3 cols
    val dropped = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow)
    assert(dropped.select("lsn").collect().map(_.getLong(0)).toSeq === Seq(1L))
    val strict = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow,
      dropMalformed = false)
    assert(strict.filter("op IS NULL").count() === 1L)
  }

  test("cell-level corruption degrades to null (try_cast), not a dead stream") {
    // ANSI mode is ON in Spark 4 — a strict cast of 'NaN-ish' text into
    // BIGINT would throw CAST_INVALID_INPUT on an executor and kill the
    // query; the decode must instead null the cell and keep the row.
    val bin = binDf(Seq(
      PgOutput.encodeInsert(1, Rel, Seq("not-a-number", "ok", "12.34"))))
    val out = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow,
      relations = Map(Rel -> "t"))
    val r = out.select("after.k", "after.v", "after.amt").collect().head
    assert(r.isNullAt(0), "uncastable BIGINT cell → null")
    assert(r.getString(1) === "ok", "row survives with its good cells")
    assert(r.getDecimal(2) === new java.math.BigDecimal("12.34"))
  }

  test("TOAST-sized cells: the encode buffer grows past 64 KiB and roundtrips") {
    val big = "x" * (1 << 18) // 256 KiB cell — pgoutput ships these routinely
    val bytes = PgOutput.encodeInsert(9, Rel, Seq("1", big, null))
    val f = PgOutput.parse(bytes)
    assert(f.tag === "I" && f.after(1) === big)
  }

  test("tuple values cast positionally to the declared row types") {
    val bin = binDf(Seq(PgOutput.encodeInsert(1, Rel, Seq("7", "s", "12.34"))))
    val out = ChangeFeed.fromBinaryFrames(bin, ChangeRelation.testRow,
      relations = Map(Rel -> "t"))
    val r = out.select("after.k", "after.amt").collect().head
    assert(r.getLong(0) === 7L)
    assert(r.getDecimal(1) === new java.math.BigDecimal("12.34"))
  }
}
