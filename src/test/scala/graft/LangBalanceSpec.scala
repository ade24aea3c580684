package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators.TextQueries

/** Pins the invariant that makes `sample_lang_balanced`'s hash-threshold
  * prefilter semantics-preserving: the top-quota-by-hash rows of the
  * PREFILTERED set equal the top-quota-by-hash rows of the full corpus
  * whenever every language keeps at least `quota` rows under its
  * threshold (or has fewer than `quota` rows total and keeps ALL of
  * them). The declared oracle ranks WITHOUT the prefilter, so the
  * driver's hash-match re-proves equivalence at sf0.01; this spec proves
  * it at the tightest fixture (sf0.001), pins the survivor margin, and
  * pins the rare-language regime where the naive `(2^60 div n) · 100`
  * product would overflow Long (n ≤ 12 — ArithmeticException under
  * Spark 4's default ANSI mode).
  */
class LangBalanceSpec extends SparkSpec {

  private val quota = 25
  private val thrExpr = TextQueries.balancedThresholdExpr(quota)

  private def hashed(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("h", expr(
      "cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))

  test("prefilter keeps >= quota survivors per lang at sf0.001") {
    val d = hashed(t(spark, sf001, "documents"))
    val thr = d.groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), expr(thrExpr).as("thr"))
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
    val d = hashed(t(spark, sf001, "documents"))
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    val full = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota).select("lang", "doc_id")
    val thr = d.groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), expr(thrExpr).as("thr"))
    val pruned = d.join(thr, "lang").filter(col("h") < col("thr"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota).select("lang", "doc_id")
    assert(full.exceptAll(pruned).isEmpty && pruned.exceptAll(full).isEmpty,
      "prefilter changed the selected sample")
  }

  test("rare-language tail survives: n <= 12 neither overflows nor drops the language") {
    import spark.implicits._
    // A 7-doc language (naive threshold product ≈ 1.6e19 > Long.MaxValue)
    // next to a 500-doc language — the exact shape a real corpus's
    // rare-language tail has and the old arithmetic killed.
    val docs = ((1 to 7).map(i => (i.toLong, "rare")) ++
      (100 to 599).map(i => (i.toLong, "common"))).toDF("doc_id", "lang")
    val d = hashed(docs)
    val thr = d.groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), expr(thrExpr).as("thr"), col("n"))

    // Thresholds must be positive (no wrap) for BOTH regimes.
    val thrRows = thr.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(thrRows.values.forall(_ > 0L), s"threshold wrapped negative: $thrRows")
    // The rare language's saturated threshold passes every possible hash.
    assert(thrRows("rare") > (1L << 60) - 1, "rare-lang threshold must pass all rows")

    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    val kept = d.join(broadcast(thr.select("lang", "thr")), "lang")
      .filter(col("h") < col("thr"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota)
      .groupBy("lang").agg(count(lit(1)).as("kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n < quota → ALL docs of the rare language are kept, none dropped.
    assert(kept("rare") == 7L, s"rare language lost docs: $kept")
    assert(kept("common") == quota.toLong, s"common language quota wrong: $kept")
  }

  test("full sample_lang_balanced query runs on a corpus with a tiny language") {
    import spark.implicits._
    // End-to-end through the declared query builder against a parquet dir
    // whose documents table has a <= 12-doc language: the old arithmetic
    // threw ArithmeticException here under ANSI.
    val dir = java.nio.file.Files.createTempDirectory("langbal").toString
    val docs = ((1 to 5).map(i => (i.toLong, "tiny", s"text $i")) ++
      (100 to 399).map(i => (i.toLong, "big", s"text $i"))).toDF("doc_id", "lang", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.Registry.all.toMap.apply("sample_lang_balanced").fn(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("tiny") == ((5L, 5L)), s"tiny language mishandled: $out")
    assert(out("big") == ((300L, quota.toLong)), s"big language mishandled: $out")
  }
}
