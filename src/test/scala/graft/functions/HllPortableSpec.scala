package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the portable HLL (sketch_hll_portable). */
class HllPortableSpec extends SparkSpec {

  private def q = graft.Registry.all.toMap.apply("sketch_hll_portable")

  test("relative error within 3.5 sigma for m=64 (sigma = 1.04/8 = 13%)") {
    q.fn(spark, sf001).collect().foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 0.455,
        s"${r.getString(0)}: rel_err ${r.getDouble(3)} beyond 3.5 sigma")
    }
  }

  test("registers are re-aggregatable: max-merge of two halves equals the whole") {
    // the 100 TB property: per-shard sketches merge by register max —
    // compute registers on the event_id-parity halves, merge, compare
    // with the single-pass registers
    val h = "cast(conv(substr(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint)"
    def regs(filterExpr: String) = graft.core.t(spark, sf001, "events")
      .filter(expr(filterExpr))
      .select(col("event_type"), expr(s"$h % 64").as("reg"), expr(s"$h div 64").as("v"))
      .withColumn("rho", least(expr("bit_count((v & -v) - 1) + 1"), lit(50)))
      .groupBy("event_type", "reg").agg(max(col("rho")).as("mr"))
    val whole = regs("true").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val even = regs("event_id % 2 = 0").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val odd = regs("event_id % 2 = 1").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val merged = (even.keySet ++ odd.keySet).map { k =>
      k -> math.max(even.getOrElse(k, 0), odd.getOrElse(k, 0))
    }.toMap
    assert(merged === whole, "shard-merged registers diverge from the single pass")
  }
}
