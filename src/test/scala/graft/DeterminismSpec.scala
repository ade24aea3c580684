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
          spark.catalog.clearCache() // per-query persists die with the query
        }
      }
      assert(run("4") === run("13"), s"$name output depends on partitioning")
    }
  }
}
