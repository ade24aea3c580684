package graft

import org.apache.spark.sql.SparkSession

/** Stage-level cost profile of the exact vs routed jaccard lanes (see
  * [[graft.operators.TextQueries.jaccardStageProfile]]) — the dev tool
  * behind SCALE.md's per-stage lane-cost rows.
  *
  * Usage: `runMain graft.JaccProfile [sfDir]`
  */
object JaccProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.TextQueries.jaccardStageProfile(spark, dir)
    spark.stop()
  }
}
