package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (round 19): per-stage wall/tasks/shuffle profile of ONE
  * declared query — the stage-level view the Spark UI would give, printed
  * as text so the optimization loop can see WHERE a query's seconds go
  * (guide §7.1) in a headless sandbox.
  *
  * Usage: sbt "runMain graft.StageProfile <query> [sfDir]"
  *   SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE_PARTITIONS / SPARK_GRAFT_SHARED /
  *   SPARK_GRAFT_AQE_ADVISORY — same knobs as Bench, so the profiled run
  *   is the bench's plan. Two runs: run1 warms (JIT + shared pipelines),
  *   run2 is profiled (the bench's measured regime).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: StageProfile <query> [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty("graft.shared.pipeline",
      sys.env.getOrElse("SPARK_GRAFT_SHARED", "true"))
    System.setProperty("graft.ann.ring",
      sys.env.getOrElse("SPARK_GRAFT_ANN_RING", "oracle"))
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      Bench.autoShufflePartitions(sfDir, cpus.toInt).toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")
    val spark = Bench.aqeScaleConfigs(shufflePartitions.toInt, cpus.toInt)
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(name: String, submitted: Long) {
      var completed: Long = 0L
      var tasks: Int = 0
      var taskTimeMs: Long = 0L
      var shufWriteB: Long = 0L
      var shufReadB: Long = 0L
      var inputB: Long = 0L
    }
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (collecting) {
          stages.put(e.stageInfo.stageId,
            St(e.stageInfo.name.takeWhile(_ != '\n'), System.nanoTime()))
          order.add(e.stageInfo.stageId)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        Option(stages.get(e.stageId)).foreach { st =>
          st.tasks += 1
          Option(e.taskMetrics).foreach { m =>
            st.taskTimeMs += m.executorRunTime
            st.shufWriteB += m.shuffleWriteMetrics.bytesWritten
            st.shufReadB += m.shuffleReadMetrics.totalBytesRead
            st.inputB += m.inputMetrics.bytesRead
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        Option(stages.get(e.stageInfo.stageId))
          .foreach(_.completed = System.nanoTime())
    })

    spark.range(100).selectExpr("sum(id)").collect()
    val fn = Registry.all.toMap.apply(name).fn
    // run1: warm (JIT, page cache, shared pipelines) — not profiled
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    graft.core.releaseQueryCaches(spark)
    spark.catalog.clearCache()
    // run2: profiled
    collecting = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    collecting = false
    Thread.sleep(1500) // drain listener bus (best effort)
    println(f"[stageprofile] $name warm run: $wall%.2f s wall, ${stages.size} stages")
    println(f"[stageprofile] ${"stageWall(s)"}%12s ${"taskSum(s)"}%10s ${"tasks"}%5s " +
      f"${"in(KB)"}%8s ${"sRd(KB)"}%8s ${"sWr(KB)"}%8s  name")
    import scala.jdk.CollectionConverters._
    val seen = scala.collection.mutable.Set.empty[Int]
    for (id <- order.asScala if seen.add(id)) {
      val st = stages.get(id)
      val w = if (st.completed > 0) (st.completed - st.submitted) / 1e9 else -1.0
      println(f"[stageprofile] $w%12.3f ${st.taskTimeMs / 1e3}%10.3f ${st.tasks}%5d " +
        f"${st.inputB / 1024}%8d ${st.shufReadB / 1024}%8d ${st.shufWriteB / 1024}%8d  s$id ${st.name.take(60)}")
    }
    spark.stop()
  }
}
