package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a named declared query and dump its formatted physical
  * plan — the `.explain` feedback loop the scale discipline demands.
  *
  * Usage: sbt "runMain graft.PlanAudit <query> [sfDir] [--explain]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Iterative-graph exchange reuse (VERDICT r14 #5): at the default
      // (true) AQE may repartition cached plans, so consumers cannot
      // rely on a cached relation's layout and re-exchange it. false
      // preserves cached-plan output partitioning; measured at sf0.1
      // this cuts graph_pagerank's runtime shuffle 49.1->20.0 MB
      // (4.35M->2.02M records) with LPA and the rest neutral.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // audit the declared (oracle-ring) plan by default; override the env
    // var to audit a production-ring variant (see SimilarityQueries.annRing)
    System.setProperty("graft.ann.ring",
      sys.env.getOrElse("SPARK_GRAFT_ANN_RING", "oracle"))
    spark.range(100).selectExpr("sum(id)").collect() // JIT warm
    val fn = Registry.all.toMap.apply(name).fn
    if (explain) {
      // plan-only build: suppress eager guard probes (e.g. the jaccard
      // density guard) so asking for the plan never runs real jobs.
      // Scoped per call stack (ADVICE r15), not a JVM-wide property.
      core.planOnly.withValue(true) {
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
    }
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(s"[audit] $name run$i ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
