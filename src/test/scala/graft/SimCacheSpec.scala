package graft

import graft.operators.SimilarityQueries

/** Shared-pipeline cache lifecycle under a mid-session dataset
  * regeneration (ADVICE r15): the fingerprint must notice ANY rewrite
  * (nanosecond mtime — a same-size regeneration within the same second
  * must not reuse a stale count), and superseded generations must be
  * EVICTED — both the nCache count and the checkpointed shared build's
  * blocks — so growth is per-live-dataset, not per-regeneration.
  */
class SimCacheSpec extends SparkSpec {

  private def regen(dir: String, mult: Int): Unit =
    ScaleGen.scaleInto(spark, sf001, dir, mult)

  test("corpusN re-counts after a regeneration and evicts the stale entry") {
    val dir = java.nio.file.Files.createTempDirectory("graft_simcache_n").toString
    regen(dir, 1)
    val n1 = SimilarityQueries.corpusN(spark, dir)
    assert(n1 > 0)
    regen(dir, 2)
    val n2 = SimilarityQueries.corpusN(spark, dir)
    assert(n2 === n1 * 2, s"stale corpus count after regeneration: $n2 != 2 x $n1")
  }

  test("sharedOr evicts a superseded generation's entry AND its checkpoint blocks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_simcache_s").toString
    regen(dir, 1)
    val prev = sys.props.put("graft.shared.pipeline", "true")
    try {
      def persistedCount: Int = spark.sparkContext.getPersistentRDDs.size
      val before = persistedCount
      val a = SimilarityQueries.sharedOr(spark, "spec", dir) {
        spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id")
      }
      val na = a.count() // before regen: eviction truncates a's lineage
      assert(na > 0)
      assert(SimilarityQueries.simCacheFps(dir).size === 1)
      assert(persistedCount === before + 1,
        "the shared build must be checkpoint-persisted")
      regen(dir, 2)
      val b = SimilarityQueries.sharedOr(spark, "spec", dir) {
        spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id")
      }
      assert(b.count() === na * 2, "stale shared build served after regeneration")
      assert(SimilarityQueries.simCacheFps(dir).size === 1,
        s"superseded generation must be evicted: ${SimilarityQueries.simCacheFps(dir)}")
      assert(persistedCount === before + 1,
        "the superseded generation's checkpoint blocks must be unpersisted")
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.shared.pipeline", v)
        case None    => sys.props.remove("graft.shared.pipeline")
      }
      // leave no cached blocks behind — DeterminismSpec's sweep-end
      // zero-blocks pin runs later in this same session
      SimilarityQueries.evictSharedFor(dir)
    }
  }
}
