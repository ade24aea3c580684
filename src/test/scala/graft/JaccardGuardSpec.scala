package graft

import org.apache.spark.sql.functions._

/** The dedup_jaccard_prefix routing guard (VERDICT r13 #2): "corpus²
  * loads belong on the LSH lane" as executable code, not prose. The
  * guard measures the exact candidate load the prefix index implies
  * (Σ_band c·(c−1)/2 per document) BEFORE the pair join launches and
  * refuses past `graft.jaccard.maxPairsPerDoc` (default 4096).
  */
class JaccardGuardSpec extends SparkSpec {

  private val fn = Registry.all.toMap.apply("dedup_jaccard_prefix").fn

  /** A boilerplate-degenerate corpus: `docs` identical documents of
    * `toks` distinct tokens each. Every prefix band is shared by every
    * document, so candidate pairs/doc = (docs−1)/2 · plen — the exact
    * shape the guard exists to refuse.
    */
  private def denseFixture(docs: Int, toks: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("jaccard_dense").toString
    val text = (0 until toks).map(i => s"tok$i").mkString(" ")
    import spark.implicits._
    (0 until docs)
      .map(i => (i.toLong, text, "en", "synthetic", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("guard trips on a dense corpus with an explicit route-to-LSH error") {
    // 400 identical docs × 300 tokens: plen = 300 − ⌈300·0.89⌉ + 1 = 34
    // shared bands → (399/2)·34 ≈ 6.8k candidate pairs/doc > 4096
    val dir = denseFixture(docs = 400, toks = 300)
    val e = intercept[IllegalStateException] { fn(spark, dir) }
    graft.core.releaseQueryCaches(spark)
    assert(e.getMessage.contains("dedup_minhash_lsh"),
      s"refusal must name the approximate lane: ${e.getMessage}")
    assert(e.getMessage.contains("graft.jaccard.maxPairsPerDoc"),
      s"refusal must name the budget knob: ${e.getMessage}")
  }

  test("guard stays silent on the declared corpus and leaves results intact") {
    // sf0.001 measures ~10² candidate pairs/doc — far inside the budget;
    // the declared key must build and produce its oracle-checked shape
    val out = fn(spark, sf001).select("d1", "d2", "ja").collect()
    graft.core.releaseQueryCaches(spark)
    assert(out.nonEmpty, "declared query must still produce pairs")
    assert(out.forall(_.getDouble(2) >= 0.9))
  }

  test("budget knob: explicit raise admits the dense corpus, 0 disables the guard") {
    val dir = denseFixture(docs = 60, toks = 300)
    // 60 identical docs: (59/2)·34 ≈ 1k pairs/doc — inside the default
    // budget, so the exact lane ACCEPTS it and finds every pair
    val pairs = fn(spark, dir).collect()
    graft.core.releaseQueryCaches(spark)
    assert(pairs.length === 300, // limit(300) of 60·59/2 = 1770 ja=1.0 pairs
      s"moderately dense corpus must still run exactly: ${pairs.length}")
    // and the same corpus trips under a tightened budget…
    System.setProperty("graft.jaccard.maxPairsPerDoc", "100")
    try {
      intercept[IllegalStateException] { fn(spark, dir) }
      graft.core.releaseQueryCaches(spark)
      // …while 0 disables the guard entirely
      System.setProperty("graft.jaccard.maxPairsPerDoc", "0")
      assert(fn(spark, dir).limit(1).collect().nonEmpty)
      graft.core.releaseQueryCaches(spark)
    } finally sys.props -= "graft.jaccard.maxPairsPerDoc"
  }
}
