package graft

/** Plan-shape regression guards for the scale fixes this round landed
  * (VERDICT r02 items 2/3): the fixes are invisible to the value-level
  * oracle — only the physical plan distinguishes a broadcast OOM bomb or
  * a 10×-corpus window sort from the safe shape — so pin them here.
  *
  * AQE gotcha: the FINAL plan only exists on the queryExecution that was
  * actually executed, so each assertion materializes its own df first.
  */
class PlanShapeSpec extends SparkSpec {

  private def executedPlan(name: String): String = {
    val df = Registry.all.toMap.apply(name).fn(spark, sf001)
    df.write.format("noop").mode("overwrite").save()
    try df.queryExecution.executedPlan.toString
    finally spark.catalog.clearCache()
  }

  private def countOf(plan: String, op: String): Int =
    op.r.findAllMatchIn(plan).size

  test("sim_ivf_topk: centroid assignment is an aggregate, not a window") {
    val plan = executedPlan("sim_ivf_topk")
    // exactly ONE window remains — the per-probe top-k; the assignment
    // argmax must be a partial+final aggregate pair
    assert(countOf(plan, "Window ") + countOf(plan, "Window\\(") <= 1,
      s"assignment window crept back:\n$plan")
    assert(countOf(plan, "SortAggregate") + countOf(plan, "HashAggregate") >= 2,
      "partial+final argmax aggregate missing")
  }

  test("dedup_minhash_verified: candidate joins stay shuffled, never broadcast") {
    val plan = executedPlan("dedup_minhash_verified")
    // the two pinned verification joins (candidates ⋈ shingle sets)
    assert(countOf(plan, "ShuffledHashJoin") >= 2,
      s"verification joins lost their shuffle-hash pin:\n$plan")
  }

  test("agg_event_funnel: two exchanges, no window, no sort before the aggs") {
    val plan = executedPlan("agg_event_funnel")
    assert(countOf(plan, "Window") === 0, "funnel must not use windows")
    assert(countOf(plan, "HashAggregate") >= 4, "two partial+final agg pairs")
  }
}
