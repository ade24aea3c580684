package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** approx_distinct_hll has no DuckDB oracle (engine-specific sketch), so
  * CORRECTNESS only proves its shape. This pins the ACCURACY contract:
  * the HLL++ estimate stays within a small multiple of the configured 1%
  * relative standard deviation of the exact distinct count, at two scale
  * factors (VERDICT r03 item 7).
  */
class HllAccuracySpec extends SparkSpec {

  private def check(sfDir: String): Unit = {
    val e = graft.core.t(spark, sfDir, "events")
    val rows = e.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      val relErr = math.abs(approx - exact) / exact
      // 3× the 1% rsd — the standard HLL confidence envelope
      assert(relErr <= 0.03,
        f"${r.getString(0)}: approx=$approx%.0f exact=$exact%.0f relErr=$relErr%.4f > 0.03 ($sfDir)")
    }
  }

  test("HLL estimate within 3×rsd of exact at sf0.001") {
    check(sf001)
  }

  test("HLL estimate within 3×rsd of exact at sf0.01") {
    check("/root/testdata/sf0.01")
  }
}
