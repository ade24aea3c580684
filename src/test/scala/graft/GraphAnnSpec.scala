package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._

/** Recall grade for the join-based graph ANN (VERDICT r10 next-round #3):
  * beam search over the bounded-degree kNN graph must recover AT LEAST
  * the recall of its own entry points (the 10 centroid vectors scored
  * exactly) against brute-force truth — the hops exist to walk from the
  * entry ring toward the probe's true neighborhood, so a beam that lost
  * recall vs hop-0 would mean the expansion was wired wrong (e.g.
  * frontier replacing the visited set instead of merging into it).
  */
class GraphAnnSpec extends SparkSpec {

  private def gdot(a: String, b: String) = expr(s"graft_dot($a, $b)")

  private def vecs: DataFrame = {
    graft.plans.DotProductD.register(spark)
    t(spark, sf001, "embeddings").select(col("vec_id"), col("embedding"))
  }

  private def probes: DataFrame = vecs.filter(col("vec_id") < 10)
    .select(col("vec_id").as("probe"), col("embedding").as("pv"),
      sqrt(gdot("embedding", "embedding")).as("pn"))

  private def top3(cands: DataFrame): Set[(Long, Long)] = {
    val w = Window.partitionBy("probe").orderBy(col("sim").desc, col("cand"))
    broadcast(probes).join(cands, col("probe") =!= col("cand"))
      .withColumn("sim", pround(gdot("pv", "cv") / (col("pn") * col("cn")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("probe"), col("cand"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("beam@3 recall >= entry-only@3 recall against brute-force truth") {
    val all = vecs.select(col("vec_id").as("cand"), col("embedding").as("cv"),
      sqrt(gdot("embedding", "embedding")).as("cn"))
    val gt = top3(all)
    // hop-0 baseline: the entry ring alone (the 10 centroid vectors)
    val entryOnly = top3(all.filter(col("cand") >= 480 && col("cand") < 490))
    val beam = Registry.all.toMap.apply("sim_graph_ann").fn(spark, sf001)
      .select(col("probe"), col("cand"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.releaseQueryCaches(spark)
    // the IVFADC lane's shortlist@3 — the quantized competitor the graph
    // index must beat (VERDICT r10 #3's done-criterion)
    val adc = graft.operators.SimilarityQueries.adcShortlist(spark, sf001, 3)
      .select(col("probe"), col("cand"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.releaseQueryCaches(spark)
    val entryRecall = (gt & entryOnly).size.toDouble / gt.size
    val beamRecall = (gt & beam).size.toDouble / gt.size
    val adcRecall = (gt & adc).size.toDouble / gt.size
    info(f"truth=${gt.size} entryRecall=$entryRecall%.3f adcRecall=$adcRecall%.3f beamRecall=$beamRecall%.3f")
    assert(beamRecall >= entryRecall,
      s"beam search must not lose recall vs its entry points: beam=$beamRecall entry=$entryRecall")
    assert(beamRecall >= adcRecall,
      s"graph beam must match-or-beat the ADC shortlist: beam=$beamRecall adc=$adcRecall")
    assert(beam.size === 30, s"expected 10 probes x 3: ${beam.size}")
  }

  test("hierarchical descent (sim_graph_hnsw) holds the flat beam's recall bar") {
    val all = vecs.select(col("vec_id").as("cand"), col("embedding").as("cv"),
      sqrt(gdot("embedding", "embedding")).as("cn"))
    val gt = top3(all)
    val flat = Registry.all.toMap.apply("sim_graph_ann").fn(spark, sf001)
      .select(col("probe"), col("cand"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.releaseQueryCaches(spark)
    val hnsw = Registry.all.toMap.apply("sim_graph_hnsw").fn(spark, sf001)
      .select(col("probe"), col("cand"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.releaseQueryCaches(spark)
    val adc = graft.operators.SimilarityQueries.adcShortlist(spark, sf001, 3)
      .select(col("probe"), col("cand"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.releaseQueryCaches(spark)
    val flatRecall = (gt & flat).size.toDouble / gt.size
    val hnswRecall = (gt & hnsw).size.toDouble / gt.size
    val adcRecall = (gt & adc).size.toDouble / gt.size
    info(f"truth=${gt.size} flatRecall=$flatRecall%.3f hnswRecall=$hnswRecall%.3f adcRecall=$adcRecall%.3f")
    assert(hnsw.size === 30, s"expected 10 probes x 3: ${hnsw.size}")
    assert(hnswRecall >= adcRecall,
      s"descent must match-or-beat the ADC shortlist: hnsw=$hnswRecall adc=$adcRecall")
    assert(hnswRecall >= flatRecall,
      s"the second layer exists to help, not hurt: hnsw=$hnswRecall flat=$flatRecall")
  }
}
