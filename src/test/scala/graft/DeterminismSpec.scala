package graft

/** SURVEY.md §5.2(5): every declared query must produce IDENTICAL collected
  * output under different shuffle partitioning. A pass means no result
  * depends on partition count, merge order, or implicit row order — the
  * exact failure class (missing total-order keys, raw-double rounding)
  * that the driver's single-config run would not catch.
  */
class DeterminismSpec extends SparkSpec {

  Registry.all.foreach { case (name, qd) =>
    test(s"shuffle-partition invariance: $name") {
      def run(parts: String): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try qd.fn(spark, sf001).collect().map(_.toString).toSeq
        finally {
          spark.conf.set("spark.sql.shuffle.partitions", "4")
          // the harness session contract: per-query persists AND
          // checkpoint blocks die with the query
          graft.core.releaseQueryCaches(spark)
          spark.catalog.clearCache()
        }
      }
      assert(run("4") === run("13"), s"$name output depends on partitioning")
    }
  }

  // Registered LAST: after the full sweep above (every declared query,
  // twice each), the release contract must leave NOTHING cached — a
  // leftover block here is a leak that a long-lived session (notebook,
  // service) would accumulate per query (VERDICT r07 #5).
  test("sweep end: zero RDD blocks remain cached after releaseQueryCaches") {
    graft.core.releaseQueryCaches(spark)
    spark.catalog.clearCache()
    val leftover = spark.sparkContext.getPersistentRDDs
    assert(leftover.isEmpty,
      s"leaked cached RDDs (${leftover.size}): " +
        leftover.values.take(5).map(r => s"id=${r.id} ${r.name}").mkString("; "))
  }
}
