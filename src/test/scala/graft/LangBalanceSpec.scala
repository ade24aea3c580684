package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._

/** Pins the invariant that makes `sample_lang_balanced`'s hash-threshold
  * prefilter semantics-preserving: the top-quota-by-hash rows of the
  * PREFILTERED set equal the top-quota-by-hash rows of the full corpus
  * whenever every language keeps at least `quota` rows under its
  * threshold. The declared oracle ranks WITHOUT the prefilter, so the
  * driver's hash-match re-proves equivalence at sf0.01; this spec proves
  * it at the tightest fixture (sf0.001) and pins the survivor margin.
  */
class LangBalanceSpec extends SparkSpec {

  private val quota = 25

  test("prefilter keeps >= quota survivors per lang at sf0.001") {
    val d = t(spark, sf001, "documents")
      .withColumn("h", expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
    val thr = d.groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), expr(s"(1152921504606846976L div n) * ${quota * 4L}").as("thr"))
    val survivors = d.join(thr, "lang").filter(col("h") < col("thr"))
      .groupBy("lang").agg(count(lit(1)).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = d.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      assert(survivors.getOrElse(l, 0L) >= quota,
        s"lang $l keeps ${survivors.getOrElse(l, 0L)} < $quota survivors — prefilter unsafe")
    }
  }

  test("prefiltered quota rank selects the same docs as the full rank") {
    val d = t(spark, sf001, "documents")
      .withColumn("h", expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    val full = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota).select("lang", "doc_id")
    val thr = d.groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), expr(s"(1152921504606846976L div n) * ${quota * 4L}").as("thr"))
    val pruned = d.join(thr, "lang").filter(col("h") < col("thr"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota).select("lang", "doc_id")
    assert(full.exceptAll(pruned).isEmpty && pruned.exceptAll(full).isEmpty,
      "prefilter changed the selected sample")
  }
}
