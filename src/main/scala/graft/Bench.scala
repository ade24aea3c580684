package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {

  /** One query's measurement: wall seconds + the error, if it threw. */
  final case class Result(name: String, sec: Double, err: Option[String])

  /** Run every query against `sfDir`, materializing ALL output columns via
    * a noop-format write — `count()` would let Catalyst prune projections
    * and under-measure map-heavy queries. A query that throws is recorded
    * with its error (and its partial wall time), never swallowed: a
    * regression that breaks a heavy query must FAIL the bench, not improve
    * its total (a swallowed throw scores ~0 s).
    */
  def runAll(spark: SparkSession, sfDir: String,
             queries: Seq[(String, (SparkSession, String) => DataFrame)]): Seq[Result] =
    queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      // drop any per-query persist() blocks so caches never accumulate
      // across the sweep — OUTSIDE the timed window (each query is billed
      // for its own materialization, not for the cleanup).
      spark.catalog.clearCache()
      Result(name, sec, err)
    }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** The driver's ONE JSON line. `errors` is {} on a clean run. */
  def renderJson(results: Seq[Result], sfDir: String): String = {
    val qs = results.map(r => s"${jstr(r.name)}:${r.sec}").mkString("{", ",", "}")
    val errs = results.collect { case Result(n, _, Some(e)) => s"${jstr(n)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_.sec).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-reader paths once so the first measured
    // query doesn't absorb ~6s of one-time JIT + session initialization.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").collect()
    val results = runAll(spark, sfDir, SparkEntry.queries.toSeq)
    println(renderJson(results, sfDir))
    spark.stop()
    if (results.exists(_.err.isDefined)) sys.exit(1)
  }
}
