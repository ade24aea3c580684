package graft.sinks

import graft.SparkSpec
import graft.functions.TsvCodec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** FsCHSink: the TabSeparated wire format written by the sink must parse
  * back to the exact input rows (escape/unescape roundtrip THROUGH the
  * files, not just in-memory — SURVEY.md §5.2(3)), and batchId replay must
  * be a no-op (§2.A12).
  */
class CHSinkSpec extends SparkSpec {

  import spark.implicits._

  private def check(prop: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Read a committed batch dir back: split on REAL tabs (escaped tabs are
    * the two-char sequence \t, so they never collide), unescape each cell.
    */
  private def readBack(dir: String, table: String): Map[Long, Option[String]] =
    spark.read.text(s"$dir/$table/batch=*")
      .select(split(col("value"), "\t", -1).as("c"))
      .select(TsvCodec.unescape(element_at(col("c"), 1)).cast("long").as("id"),
        TsvCodec.unescape(element_at(col("c"), 2)).as("payload"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

  test("nasty strings survive the TSV files byte-exactly; replay is a no-op") {
    val dir = Files.createTempDirectory("graft_chsink").toString
    val sink = new FsCHSink(dir)
    val rows: Seq[(Long, String)] = Seq(
      1L -> "plain",
      2L -> "tab\there",
      3L -> "nl\nhere",
      4L -> "back\\slash",
      5L -> "\\N", // the literal two-char string, NOT null
      6L -> "",
      7L -> null)
    assert(sink.insert(rows.toDF("id", "payload"), "t", batchId = 0))
    assert(!sink.insert(Seq((99L, "stale")).toDF("id", "payload"), "t", batchId = 0))
    assert(sink.committedBatches("t") === Set(0L))
    assert(readBack(dir, "t") === rows.map { case (k, v) => k -> Option(v) }.toMap)
  }

  test("property: arbitrary strings roundtrip through the sink files") {
    val genCell: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf('\t', '\n', '\\'),
      1 -> Gen.oneOf('N', ' '))).map(_.mkString)
    val genRows: Gen[List[String]] = Gen.nonEmptyListOf(genCell)
    val dir = Files.createTempDirectory("graft_chsink_prop").toString
    val sink = new FsCHSink(dir)
    var batch = 0L
    check(Prop.forAllNoShrink(genRows) { cells =>
      val rows = cells.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val table = s"p$batch"
      sink.insert(rows.toDF("id", "payload"), table, batch)
      batch += 1
      readBack(dir, table) == rows.map { case (k, v) => k -> Option(v) }.toMap
    })
  }
}
