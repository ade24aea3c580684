package graft

import org.apache.spark.sql.SparkSession

/** Runtime shuffle audit — the SCALE.md exchange-reuse methodology as a
  * reusable tool (it was an ad-hoc scratch harness in round 15): run ONE
  * declared query cold and report the SparkListener sum of shuffle-write
  * bytes/records over the whole query, plus wall seconds.
  *
  * Usage: sbt "runMain graft.ShuffleAudit <query> [sfDir]"
  *   SPARK_GRAFT_CPUS      cores (default 4 — the SCALE.md audit config)
  *   SPARK_GRAFT_SHARED    graft.shared.pipeline (default true: audit the
  *                         harness path, where the shared graph builds
  *                         and their carrier live)
  *   SPARK_GRAFT_CARRIER   graft.shared.carrier persist|checkpoint
  *
  * The shared build runs INSIDE the measured window (cold query = build
  * + iterations, exactly like the first harness pass); what the carrier
  * changes is whether the iterations after it re-exchange the cached
  * relations.
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: ShuffleAudit <query> [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    System.setProperty("graft.shared.pipeline",
      sys.env.getOrElse("SPARK_GRAFT_SHARED", "true"))
    sys.env.get("SPARK_GRAFT_CARRIER")
      .foreach(System.setProperty("graft.shared.carrier", _))
    System.setProperty("graft.ann.ring",
      sys.env.getOrElse("SPARK_GRAFT_ANN_RING", "oracle"))
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      Bench.autoShufflePartitions(sfDir, cpus.toInt).toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")
    // Same memory-regime AQE coalesce wiring as Bench.main, so audited
    // runs measure the plan shape the bench actually executes.
    val spark = Bench.aqeScaleConfigs(shufflePartitions.toInt, cpus.toInt)
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val records = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
    })
    spark.range(100).selectExpr("sum(id)").collect() // JIT warm, no shuffle
    val fn = Registry.all.toMap.apply(name).fn
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      println(df.queryExecution.executedPlan.toString)
    // drain the async listener bus (listenerBus.waitUntilEmpty is
    // private[spark]): require 3 CONSECUTIVE stable 500 ms polls — one
    // unchanged poll can be a GC pause, not an empty bus — and cap the
    // wait at 30 s so a trickling bus cannot busy-wait forever.
    var last = -1L
    var stable = 0
    val drainDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (stable < 3 && System.nanoTime() < drainDeadline) {
      val cur = bytes.get + records.get
      if (cur == last) stable += 1 else { stable = 0; last = cur }
      Thread.sleep(500)
    }
    println(f"""[shuffleaudit] {"query":"$name","carrier":"${
      sys.props.getOrElse("graft.shared.carrier", "auto")}","shared":${
      sys.props("graft.shared.pipeline")},"cpus":$cpus,"partitions":$shufflePartitions,"shuffle_mb":${
      bytes.get / 1e6}%.1f,"shuffle_records":${records.get},"wall_sec":$wall%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
