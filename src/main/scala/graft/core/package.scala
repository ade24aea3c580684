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

  /** Scale-adaptive scan spread (round 19; guide §2.5 "input skew: one
    * huge unsplittable file … repartition immediately after the read").
    * Parquet scans parallelize only across row groups / split ranges,
    * and the local fixtures are single-row-group files — so every
    * map-heavy pass over a scan (md5 shingling, minhash lanes, dot
    * products, levenshtein) serializes on ONE core regardless of the
    * session's core count (measured: dedup_band_admit spent 2×1.5 s in
    * one-task minhash map stages on a 32-core session). When the scan's
    * estimated split count would leave over half the cores idle AND the
    * relation is big enough that map CPU dominates one narrow exchange
    * (≥ 256 KiB — the tiny dims and sub-sf0.1 fixtures stay unsplit),
    * hash-spread it across the cores on the table's dense primary key
    * (deterministic under retry, unlike rand-derived keys — guide §2.5;
    * and downstream key-clustered ops reuse the layout instead of
    * re-exchanging). At cluster scale a healthy table has ≥ cores
    * splits, the condition is false, and the scan is untouched — the
    * rule is derived from input size, not tuned to a core count.
    */
  def tSpread(spark: SparkSession, sfDir: String, name: String, key: String): DataFrame = {
    val df = t(spark, sfDir, name)
    // knob for A/B sweeps (mirrors SPARK_GRAFT_AQE_ADVISORY=off)
    if (sys.env.get("SPARK_GRAFT_SCAN_SPREAD").contains("off")) return df
    val cores = spark.sparkContext.defaultParallelism
    def size(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(size).sum)
      else f.length()
    val bytes = size(new java.io.File(s"$sfDir/$name.parquet"))
    val maxSplit = {
      val raw = try spark.conf.get("spark.sql.files.maxPartitionBytes")
        catch { case _: Throwable => "" }
      val digits = raw.takeWhile(_.isDigit)
      if (digits.nonEmpty) digits.toLong else 128L << 20
    }
    val splits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    if (bytes >= (256L << 10) && splits * 2 <= cores)
      df.repartition(cores, col(key))
    else df
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

  /** Eager localCheckpoint RIGHT-SIZED by its own materialized bytes
    * (round 19, guide §2.2 "fewer, larger partitions"): a checkpointed
    * relation keeps its build-time partition count — the shuffle-
    * partition initial count (32 locally, 1024+ at the 100× boards) —
    * and AQE coalescing cannot reach cached plans, so EVERY downstream
    * stage that scans it pays that task count no matter how few bytes
    * it holds (a 2000-row ANN assignment table scanned ~15× per graph
    * query = ~500 no-op tasks). After materializing, read the blocks'
    * actual size from the storage info and coalesce to ceil(bytes /
    * advisory) partitions, clamping the advisory to [1, 16] MiB so an
    * unwired session's 64 MiB default cannot serialize a genuinely
    * large relation. coalesce() is a narrow, deterministic merge —
    * values and their free-on-release path (the LogicalRDD leaf) are
    * unchanged.
    */
  def ckptRightsized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val ck = df.localCheckpoint(true)
    val rddId = ck.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }
    val parts = rddId.map(_ => ck.rdd.getNumPartitions).getOrElse(1)
    val bytes = rddId.flatMap(id =>
      spark.sparkContext.getRDDStorageInfo.find(_.id == id))
      .map(i => i.memSize + i.diskSize).getOrElse(0L)
    val advisory = {
      val raw = try spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        catch { case _: Throwable => "" }
      val digits = raw.takeWhile(_.isDigit)
      val v = if (digits.nonEmpty) digits.toLong else 4L << 20
      math.max(1L << 20, math.min(16L << 20, v))
    }
    val target = math.max(1L, math.min(parts.toLong,
      (bytes + advisory - 1) / advisory)).toInt
    if (2 * target <= parts) ck.coalesce(target) else ck
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
