package graft

import org.apache.spark.sql.functions._
import graft.core._

/** Error-bound grades for the portable approximate sketches (VERDICT r09
  * next-round #2/#3) — the assertions that make "approximate" a contract
  * rather than a hope. The declared queries already carry estimate and
  * exact truth side by side (oracle-checked); these tests pin the GAP.
  */
class ApproxSketchSpec extends SparkSpec {

  test("agg_approx_percentile: error within bin-width/2 + local order-stat spacing") {
    // The histogram picks the bin holding the ceil(p·n)-th order
    // statistic, so the midpoint is within w/2 of it; the exact
    // interpolated percentile sits between adjacent order statistics of
    // the same neighborhood. The principled bound is therefore
    // w/2 + spacing(p), where spacing is the exact quantile spread over
    // p ± 2/n — data-adaptive, so the assertion stays honest at ANY
    // scale factor (at sf0.001 n ≈ 200 and spacing dominates; at sf0.01+
    // the bin width does).
    val rows = Registry.all.toMap.apply("agg_approx_percentile")
      .fn(spark, sf001).collect()
    graft.core.releaseQueryCaches(spark)
    assert(rows.nonEmpty)
    val spacing = t(spark, sf001, "events")
      .groupBy("event_type")
      .agg(sort_array(collect_list(col("value"))).as("xs"))
      .collect().map { r =>
        val xs = r.getSeq[Double](1)
        def spread(p: Double): Double = {
          val k = math.ceil(p * xs.size).toInt - 1
          xs(math.min(xs.size - 1, k + 2)) - xs(math.max(0, k - 2))
        }
        r.getString(0) -> (spread(0.5), spread(0.9))
      }.toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val w = r.getAs[Double]("bin_w")
      val (s50, s90) = spacing(et)
      val e50 = math.abs(r.getAs[Double]("approx_p50") - r.getAs[Double]("exact_p50"))
      val e90 = math.abs(r.getAs[Double]("approx_p90") - r.getAs[Double]("exact_p90"))
      assert(e50 <= w / 2 + s50, s"$et: p50 error $e50 > ${w / 2} + $s50")
      assert(e90 <= w / 2 + s90, s"$et: p90 error $e90 > ${w / 2} + $s90")
    }
  }

  test("sketch_topk: candidate counts are exact; recall vs exact top-20 measured") {
    val approx = Registry.all.toMap.apply("sketch_topk").fn(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    graft.core.releaseQueryCaches(spark)
    val exact = t(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("c"))
      .orderBy(col("c").desc, col("w")).limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val exactMap = exact.toMap
    // lane truncation can only DROP words, never miscount them: every
    // candidate the sketch returns must carry its exact global count
    approx.foreach { case (w, c) =>
      assert(exactMap.get(w).forall(_ == c) || !exactMap.contains(w),
        s"sketch count for '$w' ($c) disagrees with exact (${exactMap.get(w)})")
    }
    val recall = approx.map(_._1).toSet.intersect(exact.map(_._1).toSet).size / 20.0
    info(f"sketch_topk recall@20 = $recall%.2f")
    // 8 lanes x 5 slots = 40 bounded counters; a miss needs >=5 of the
    // top-20 hashing into one lane — rare, but graded, not assumed
    assert(recall >= 0.7, s"recall@20 $recall below the 0.7 floor")
  }
}
