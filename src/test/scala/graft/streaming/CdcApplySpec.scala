package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** CDC apply algebra on the FIXTURES.md §3.1 golden sequence plus
  * ScalaCheck invariants (SURVEY.md §5.2(3)):
  *   applyReplacing ≡ last-write-wins map,
  *   collapse(insert;delete) ≡ ∅,
  *   restart-replay of lsn ≤ frontier is a no-op.
  */
class CdcApplySpec extends SparkSpec {

  /** scalatest/scalacheck bridge jar isn't cached offline - drive
    * scalacheck directly and assert the result. */
  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val rowT = ChangeRelation.testRow

  private def changes(rows: Seq[(Long, String, Option[(Long, String)], Option[(Long, String)])]): DataFrame = {
    val data = rows.map { case (lsn, op, before, after) =>
      Row(lsn, op, "t",
        before.map { case (k, v) => Row(k, v, null) }.orNull,
        after.map { case (k, v) => Row(k, v, null) }.orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data),
      ChangeRelation.schema(rowT))
  }

  // FIXTURES.md §3.1 golden sequence.
  private val golden = changes(Seq(
    (1L, "I", None, Some((1L, "a"))),
    (2L, "U", Some((1L, "a")), Some((1L, "b"))),
    (3L, "U", Some((1L, "b")), Some((1L, "c"))),
    (4L, "I", None, Some((2L, "x"))),
    (5L, "D", Some((2L, "x")), None)))

  test("golden: applyReplacing keeps latest version, drops deleted key") {
    val out = CdcApply.applyReplacing(golden, Seq("k"))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === Set((1L, "c")))
  }

  test("golden: collapse nets out insert;delete, keeps last update value") {
    val out = CdcApply.collapse(CdcApply.toSignedRows(golden))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === Set((1L, "c")))
  }

  test("golden: applyAppend keeps all inserted physical rows") {
    val out = CdcApply.applyAppend(golden).select("k").collect().map(_.getLong(0))
    assert(out.sorted.toSeq === Seq(1L, 2L))
  }

  test("golden: signed stream has sum(sign) in {0,1} per key") {
    val sums = CdcApply.toSignedRows(golden)
      .groupBy("row.k").sum("sign").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums === Map(1L -> 1L, 2L -> 0L))
  }

  // A9 truncate: T at LSN 3 wipes everything before it; only post-T
  // changes survive, in every engine semantics.
  private val goldenT = changes(Seq(
    (1L, "I", None, Some((1L, "a"))),
    (2L, "U", Some((1L, "a")), Some((1L, "b"))),
    (3L, "T", None, None),
    (4L, "I", None, Some((2L, "x"))),
    (5L, "U", Some((2L, "x")), Some((2L, "y")))))

  test("golden+truncate: applyReplacing keeps only post-truncate state") {
    val out = CdcApply.applyReplacing(goldenT, Seq("k"))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === Set((2L, "y")))
  }

  test("golden+truncate: collapse and append see only post-truncate rows") {
    val collapsed = CdcApply.collapse(CdcApply.toSignedRows(goldenT))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(collapsed.toSet === Set((2L, "y")))
    val appended = CdcApply.applyAppend(goldenT).select("k").collect().map(_.getLong(0))
    assert(appended.toSeq === Seq(2L))
  }

  test("golden+truncate: trailing truncate empties the table") {
    val df = changes(Seq(
      (1L, "I", None, Some((1L, "a"))),
      (2L, "T", None, None)))
    assert(CdcApply.applyReplacing(df, Seq("k")).count() === 0L)
    assert(CdcApply.collapse(CdcApply.toSignedRows(df)).count() === 0L)
    assert(CdcApply.applyAppend(df).count() === 0L)
  }

  test("truncate is per-table: other tables are untouched") {
    val data = Seq(
      org.apache.spark.sql.Row(1L, "I", "t1", null, Row(1L, "a", null)),
      org.apache.spark.sql.Row(2L, "I", "t2", null, Row(9L, "z", null)),
      org.apache.spark.sql.Row(3L, "T", "t1", null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data), ChangeRelation.schema(rowT))
    val out = CdcApply.applyReplacing(df, Seq("k"))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === Set((9L, "z")))
  }

  // Random op sequences: I for a new key, U/D for a live key.
  private case class Op(lsn: Long, op: String, key: Long, value: String)

  private val genOps: Gen[List[Op]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0, 2), Gen.alphaStr.map(_.take(3))))
      .map { raw =>
        var live = Set.empty[Long]
        raw.zipWithIndex.flatMap { case ((key, kind, v), i) =>
          val lsn = i + 1L
          if (!live.contains(key)) { live += key; Some(Op(lsn, "I", key, v)) }
          else kind match {
            case 0 => Some(Op(lsn, "U", key, v))
            case 1 => live -= key; Some(Op(lsn, "D", key, v))
            case _ => Some(Op(lsn, "U", key, v))
          }
        }
      }

  private def toDf(ops: List[Op]): DataFrame = {
    var last = Map.empty[Long, String]
    val rows = ops.map { o =>
      val before = last.get(o.key)
      o.op match {
        case "I" => last += o.key -> o.value
        case "U" => last += o.key -> o.value
        case "D" => last -= o.key
      }
      (o.lsn, o.op, before.map(v => (o.key, v)), if (o.op == "D") None else Some((o.key, o.value)))
    }
    changes(rows)
  }

  /** Reference model: last-write-wins map with delete. */
  private def lww(ops: List[Op]): Map[Long, String] =
    ops.foldLeft(Map.empty[Long, String]) { (m, o) =>
      o.op match {
        case "D" => m - o.key
        case _ => m + (o.key -> o.value)
      }
    }

  test("property: applyReplacing == last-write-wins; collapse == same surviving set") {
    check(Prop.forAllNoShrink(genOps) { ops =>
      val df = toDf(ops)
      val expected = lww(ops)
      val replaced = CdcApply.applyReplacing(df, Seq("k"))
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val collapsed = CdcApply.collapse(CdcApply.toSignedRows(df))
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      replaced == expected && collapsed == expected
    })
  }

  test("property: truncate-bearing sequences == model that resets at each T") {
    // ops with ~10% truncates; model: T clears all accumulated state
    val genOpsT: Gen[List[(Long, String, Long, String)]] =
      Gen.listOfN(40, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0, 9), Gen.alphaStr.map(_.take(3))))
        .map { raw =>
          var live = Set.empty[Long]
          raw.zipWithIndex.map { case ((key, kind, v), i) =>
            val lsn = i + 1L
            if (kind == 9) { live = Set.empty; (lsn, "T", 0L, "") }
            else if (!live.contains(key)) { live += key; (lsn, "I", key, v) }
            else if (kind == 0) { live -= key; (lsn, "D", key, v) }
            else (lsn, "U", key, v)
          }
        }
    check(Prop.forAllNoShrink(genOpsT) { ops =>
      // build change rows, tracking before-values; model resets on T
      var last = Map.empty[Long, String]
      val rows = ops.map { case (lsn, op, k, v) =>
        val before = last.get(k)
        op match {
          case "T" => last = Map.empty
          case "D" => last -= k
          case _ => last += k -> v
        }
        (lsn, op,
          if (op == "T") None else before.map(b => (k, b)),
          if (op == "T" || op == "D") None else Some((k, v)))
      }
      val df = changes(rows)
      val replaced = CdcApply.applyReplacing(df, Seq("k"))
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val collapsed = CdcApply.collapse(CdcApply.toSignedRows(df))
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      replaced == last && collapsed == last
    })
  }

  test("property: replaying a prefix at-or-below the frontier is a no-op") {
    check(Prop.forAllNoShrink(genOps, Gen.choose(0, 40)) { (ops, cut) =>
      val df = toDf(ops)
      val frontier = math.min(cut.toLong, ops.size.toLong)
      val replayed = CdcApply.dropReplayed(df, frontier)
      replayed.filter(org.apache.spark.sql.functions.col("lsn") <= frontier).count() == 0L
    })
  }
}
