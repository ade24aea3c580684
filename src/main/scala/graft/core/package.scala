package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core helpers shared by every operator in the engine.
  *
  * Determinism discipline (SURVEY.md §7.3): money/value aggregates go
  * decimal-sum → round(2) → double; averages are one IEEE double division;
  * counts are BIGINT; every declared query ends in a total ORDER BY.
  */
package object core {

  /** One declared query: the Spark plan plus (optionally) the equivalent
    * DuckDB oracle SQL. `oracle = None` → driver records a rows-only check.
    */
  final case class QueryDef(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      tier: String = "C")

  /** Parquet table reader — the only input path the engine uses.
    * Explicit schemas come from the files themselves (parquet is
    * self-describing); never CSV/inferSchema (FIXTURES.md §2).
    *
    * `events.ts` arrived as TIMESTAMP(NANOS) in rounds ≤8 — which Spark 4
    * refuses to read natively (PARQUET_TYPE_ILLEGAL): read it as raw nanos
    * via the legacy conf and truncate to a µs timestamp, the same
    * floor-truncation DuckDB applies on read (FIXTURES.md §1). Since
    * round 9 the driver writes TIMESTAMP(MICROS) (→ TimestampNTZ), which
    * needs no transform; the LongType guard below handles either shape.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
        d.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else d
    }
  }

  /** Cast to exact decimal — the first step of every money aggregate. */
  def dec(c: Column, p: Int = 18, s: Int = 2): Column = c.cast(DecimalType(p, s))

  /** decimal-sum → round → double: hash-stable across Spark and DuckDB. */
  def moneySum(c: Column, p: Int = 18, s: Int = 2): Column =
    round(sum(dec(c, p, s)), 2).cast("double")

  /** Exact average as one double division (SURVEY §7.3 rule 3). */
  def moneyAvg(c: Column, p: Int = 18, s: Int = 2): Column =
    round(sum(dec(c, p, s)).cast("double") / count(c).cast("double"), 2)

  /** count(*) as BIGINT under a stable alias. */
  def cnt(alias: String): Column = count(lit(1)).cast("long").as(alias)

  /** Portable double rounding: floor(x·10ⁿ + 0.5)/10ⁿ.
    *
    * Engines disagree on `round(double, n)` at representation boundaries
    * (Spark rounds the shortest decimal string HALF_UP, DuckDB scales the
    * binary value), so every declared query that rounds a genuine double
    * (division, sqrt, cosine) uses THIS exact arithmetic on both sides —
    * identical IEEE ops ⇒ identical results. Decimal rounds stay `round`
    * (both engines are HALF_UP on decimals — verified 2026-08-12).
    */
  def pround(c: Column, n: Int): Column = {
    val p = lit(math.pow(10, n))
    floor(c * p + lit(0.5)) / p
  }

  /** DuckDB twin of [[pround]] — inline SQL with the same arithmetic. */
  def proundSql(x: String, n: Int): String = {
    val p = "1" + ("0" * n) + ".0"
    s"floor(($x) * $p + 0.5) / $p"
  }

  // --------------------------------------------------------------------
  // Query-scoped cache registry (VERDICT r07 #5).
  //
  // Several declared queries persist() or localCheckpoint() heavy
  // intermediates. A lazily-consumed DataFrame cannot unpersist them on
  // the return path (the caller hasn't materialized anything yet), so the
  // SESSION CONTRACT is: after consuming a query's result, the caller
  // invokes releaseQueryCaches(spark). Bench, Verify, and the test
  // harness do; a long-lived embedding (notebook, service) must too, or
  // blocks accumulate. catalog.clearCache() alone is NOT enough — it
  // frees plan-cache entries but not localCheckpoint RDD blocks.
  // --------------------------------------------------------------------

  private val queryCaches =
    scala.collection.mutable.Map.empty[SparkSession,
      scala.collection.mutable.ArrayBuffer[() => Unit]]

  private def registerCleanup(spark: SparkSession)(f: () => Unit): Unit =
    queryCaches.synchronized {
      queryCaches.getOrElseUpdate(spark,
        scala.collection.mutable.ArrayBuffer.empty) += f
    }

  /** persist(MEMORY_AND_DISK) + register the block for release at the
    * end of the current query's consumption.
    */
  def scopedPersist(df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registerCleanup(df.sparkSession)(() => { df.unpersist(false); () })
    df
  }

  /** Eager localCheckpoint + register its RDD blocks for release. Used
    * where lineage truncation is the point (iterative plans); unlike
    * persist, checkpoint blocks survive catalog.clearCache(), so an
    * unregistered one is a true leak in a long-lived session.
    */
  def scopedCheckpoint(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(true)
    registerCleanup(out.sparkSession)(() => releaseCheckpoint(out))
    out
  }

  /** Free the RDD blocks behind a localCheckpoint'd DataFrame —
    * Dataset.unpersist only covers plan-cache entries, so walk to the
    * LogicalRDD and unpersist the materialized RDD itself.
    */
  def releaseCheckpoint(out: DataFrame): Unit =
    out.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false); ()
      case _ => ()
    }

  /** Release every cache a declared query registered on this session.
    * Idempotent; safe if the query also unpersisted eagerly itself.
    */
  def releaseQueryCaches(spark: SparkSession): Unit = {
    val fs = queryCaches.synchronized { queryCaches.remove(spark) }
    fs.foreach(_.foreach(f => try f() catch { case _: Throwable => () }))
  }

  /** Chainable forms of the scoped-cache helpers. */
  implicit class ScopedCacheOps(private val df: DataFrame) extends AnyVal {
    def scopedPersist(): DataFrame = core.scopedPersist(df)
    def scopedCheckpoint(): DataFrame = core.scopedCheckpoint(df)
  }

  /** Plan-only builds (PlanAudit --explain): suppress eager guard probe
    * jobs for THIS call stack only. A DynamicVariable, not a JVM-wide
    * system property (ADVICE r15) — a concurrent thread building the
    * same query still runs its guard, and nested/forgotten cleanup
    * cannot leak the flag past the `withValue` scope.
    */
  val planOnly = new scala.util.DynamicVariable[Boolean](false)

  /** Named long accumulators for operator telemetry (VERDICT r15 #7):
    * registered once per (SparkContext, name) so a cluster operator
    * sees the value on the listener bus / status APIs, where a
    * driver-local system property is invisible. Driver-set gauges:
    * reset + add on each measurement.
    */
  private val gaugeReg = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String),
    org.apache.spark.util.LongAccumulator]()

  def gauge(spark: SparkSession, name: String): org.apache.spark.util.LongAccumulator =
    gaugeReg.computeIfAbsent((spark.sparkContext, name), { key =>
      val acc = new org.apache.spark.util.LongAccumulator
      key._1.register(acc, key._2)
      acc
    })

  def setGauge(spark: SparkSession, name: String, v: Long): Unit = {
    val g = gauge(spark, name)
    g.reset(); g.add(v)
  }
}
