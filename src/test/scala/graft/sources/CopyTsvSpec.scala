package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CopyTsv: the A1 snapshot-parse half against the A5 encode half — the
  * roundtrip law `read(lines(df)) == df` over hostile cell content
  * (tabs, newlines, backslashes, `\N`-lookalikes, NULLs, empty strings)
  * and over real testdata.
  */
class CopyTsvSpec extends SparkSpec {

  import spark.implicits._

  test("COPY text roundtrip: hostile strings, nulls, booleans, numerics") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("b", BooleanType), StructField("d", DoubleType)))
    val rows = Seq(
      (1L, "plain", true, 1.5),
      (2L, "tab\there", false, -2.0),
      (3L, "line\nbreak", true, 0.0),
      (4L, "back\\slash", false, 3.25),
      (5L, "\\N lookalike stays a string", true, 4.0),
      (6L, null.asInstanceOf[String], false, 5.0),
      (7L, "", true, 6.0),
      // ADVICE r07: bare CR is BOTH a line-splitter for Hadoop's reader
      // and un-decoded by the old unescape — must survive the roundtrip
      (8L, "carriage\rreturn", false, 7.0),
      (9L, "crlf\r\npair", true, 8.0),
      (10L, "ctl\bback\ffeed\u000bvtab", false, 9.0),
      (11L, "mixed\\r literal then real\r", true, 10.0))
    val df = spark.createDataFrame(rows.toDF("id", "s", "b", "d").rdd, schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_copytsv").toString
    CopyTsv.lines(df).write.mode("overwrite").text(dir)
    val back = CopyTsv.read(spark, dir, schema)
    val a = df.orderBy("id").collect().map(_.toString).toSeq
    val b = back.orderBy("id").collect().map(_.toString).toSeq
    assert(a === b, "read(lines(df)) must reproduce df exactly")
    // NULL vs empty string are distinct in COPY text (`\N` vs nothing)
    val byId = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(6L).isNullAt(1), "\\N must decode to SQL NULL")
    assert(byId(7L).getString(1) === "", "empty cell must stay empty string")
  }

  test("COPY text roundtrip over the real region table") {
    val region = graft.core.t(spark, sf001, "region")
    val dir = java.nio.file.Files.createTempDirectory("graft_copytsv_r").toString
    CopyTsv.lines(region).write.mode("overwrite").text(dir)
    val back = CopyTsv.read(spark, dir, region.schema)
    assert(back.orderBy("r_regionkey").collect().map(_.toString).toSeq ===
      region.orderBy("r_regionkey").collect().map(_.toString).toSeq)
  }

  test("the parse is a map-only plan — no shuffle, no UDF") {
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_copytsv_p").toString
    CopyTsv.lines(Seq((1L, "x")).toDF("id", "s")).write.mode("overwrite").text(dir)
    val df = CopyTsv.read(spark, dir, schema)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"COPY parse must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "parse must stay in codegen'd string expressions")
  }
}
