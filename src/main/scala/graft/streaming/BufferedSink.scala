package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Two-phase, exactly-once micro-batch sink with buffer→main compaction —
  * the Spark-native form of the reference's buffer-table flush pipeline
  * (SURVEY.md §2.A10–A13).
  *
  * pg2ch buffers rows in memory, flushes them into a ClickHouse staging
  * ("buffer") table with an explicit `row_id`, and every `merge_threshold`
  * flushes promotes them into the main table in `row_id` order, truncating
  * the buffer; the replication slot is only acked after the flush
  * succeeds, and restart replays are dropped via the persisted LSN
  * (`pkg/tableengines/generic.go` FlushToMainTable, `pkg/consumer`
  * standby-status [recall:med] — SURVEY §0 caveat applies).
  *
  * Spark mapping: `foreachBatch` hands us (batch, batchId); we stage the
  * batch to `_staging/<batchId>`, atomically rename into the committed
  * area, and record the batchId in a manifest. A redelivered batchId
  * (checkpoint replay after crash) is a no-op — the manifest is the
  * equivalent of the reference's persisted LSN.
  *
  * ALL state I/O goes through [[StateFs]] (the Hadoop `FileSystem` API),
  * so `tableDir` may live on the stream's checkpoint store — HDFS, S3A,
  * ABFS — not just the driver's local disk; a cluster's driver and
  * executors do not share a local filesystem. The batchId manifest is a
  * marker DIRECTORY (`_committed_batches/b=<id>`, creation = commit)
  * rather than an appended file: HDFS append is optional and object
  * stores have none, and one marker per batch keeps the commit a single
  * create instead of a read-modify-write.
  *
  * Compaction (A11's second half): with `mergeThreshold > 0`, once that
  * many committed batch dirs are live they are merged — sorted by the
  * explicit `__row_id` stamped at write time (batchId-major, intra-batch
  * arrival order minor; `monotonically_increasing_id` is NOT stable, so we
  * never use it) — into one `main/seg-<maxBatchId>` segment, and the
  * merged batch dirs are deleted. Without compaction a long-running
  * stream lands one directory per micro-batch forever and every read
  * re-opens all of them — unbounded small-file growth, the failure every
  * real long-running replication hits.
  *
  * Crash safety: the set of batch ids a segment covers is written INSIDE
  * the staged segment (`_batches`, an underscore file parquet readers
  * ignore) before the atomic move, so segment data + coverage commit
  * together. The live set is always derived as committed − covered; a
  * crash after the move but before the batch-dir deletes only leaves
  * garbage dirs that the next compaction (or read) ignores and later
  * retires. ClickHouse itself is not in this environment, so the writer
  * targets a filesystem table layout; the TSV wire encoding lives in
  * graft.functions.TsvCodec.
  *
  * @param mergeThreshold compact every N committed batches; 0 = never
  *        (the raw landing behavior).
  * @param orderCols intra-batch arrival-order key for `__row_id` (the WAL
  *        feed's `lsn` by default). Ranks over it are computed with the
  *        parallel two-level decomposition (range-partition → local
  *        row_number → broadcast partition-count offsets), so stamping
  *        stays distributed even for a GB-scale snapshot micro-batch.
  * @param segmentMerge engine-aware row reduction applied to each
  *        segment's rows as it compacts (ClickHouse's background
  *        part-merge analog — [[CdcApply.mergeSlice]]); identity by
  *        default (pg2ch copies buffer rows verbatim).
  */
final class BufferedSink(tableDir: String, mergeThreshold: Int = 0,
                         orderCols: Seq[String] = Seq("lsn"),
                         segmentMerge: DataFrame => DataFrame = identity) {

  private val root = new HPath(tableDir)
  private val committed = new HPath(root, "_committed_batches")
  private val mainDir = new HPath(root, "main")

  def committedBatches(): Set[Long] = StateFs.markers(committed)

  /** Batch ids already merged into main segments (from seg metadata —
    * the authoritative record; it commits atomically with the data).
    */
  def compactedBatches(): Set[Long] =
    segDirs().flatMap { seg =>
      StateFs.readLines(new HPath(seg, "_batches"))
        .filter(_.nonEmpty).map(_.toLong)
    }.toSet

  /** Committed but not yet compacted (their `batch=<id>` dirs are live). */
  def liveBatches(): Set[Long] = committedBatches() -- compactedBatches()

  private def segDirs(): Seq[HPath] =
    StateFs.listNames(mainDir).filter(_.startsWith("seg-")).sorted
      .map(new HPath(mainDir, _))

  /** Idempotent micro-batch write: stage → atomic move → manifest marker,
    * then compaction when the live-batch count reaches the threshold.
    * Safe to call again with the same batchId (crash-replay path).
    */
  def writeBatch(batch: DataFrame, batchId: Long): Boolean = {
    if (committedBatches().contains(batchId)) return false
    val staging = new HPath(root, s"_staging/$batchId")
    val target = new HPath(root, s"batch=$batchId")
    // explicit arrival-order row_id (SURVEY §1.1 aux columns): batchId in
    // the high 32 bits, the intra-batch rank in the low 32.
    // fall back to all columns when the configured order key is absent
    // (generic batches): still a deterministic total order attempt, so a
    // replayed batch stamps identical row_ids.
    val (ordered, release) = stampRowIds(batch, batchId)
    try ordered.write.mode("overwrite").parquet(staging.toString)
    finally release()
    // a lost commitMove means a previous attempt's move already landed
    // (crashed between move and marker): keep the committed copy
    if (!StateFs.commitMove(staging, target)) StateFs.delete(staging)
    StateFs.addMarker(committed, batchId)
    if (mergeThreshold > 0) maybeCompact(batch.sparkSession)
    true
  }

  /** Stamp `__row_id = batchId·2³² + global arrival rank` WITHOUT an
    * unpartitioned window — a snapshot micro-batch can be GBs, and a
    * single-task `row_number` funnel is exactly the scale-killer the
    * repo-wide PlanShapeSpec pin forbids. The win_ntile two-level
    * decomposition instead: range-partition on the order key (equal keys
    * land in one partition, so partition i's rows all order before
    * partition i+1's), per-partition `row_number` (parallel), then global
    * rank = broadcast prefix-sum of preceding partition counts + local
    * rank — bit-identical to a single global window's stamp. The ranked
    * relation is persisted so the sampled range boundaries are computed
    * once: counts and the final join must see ONE partitioning, or a
    * replayed batch could stamp different ids. Returns the stamped frame
    * and a release thunk the caller runs after consuming it.
    */
  def stampRowIds(batch: DataFrame, batchId: Long): (DataFrame, () => Unit) = {
    // the working columns below are added with withColumn, which silently
    // REPLACES same-named user columns — refuse loudly instead of
    // corrupting a batch that happens to carry one of the reserved names
    val reserved = Seq("__pid", "__lrn", "__off", "__row_id")
    val clash = batch.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"batch carries reserved internal column(s) ${clash.mkString(", ")}; " +
        "rename them before sinking")
    val effOrder =
      if (orderCols.forall(batch.columns.contains)) orderCols
      else batch.columns.toSeq
    val sortCols = effOrder.map(col)
    val ranked = batch
      .repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(
        Window.partitionBy("__pid").orderBy(sortCols: _*)).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = ranked.groupBy("__pid").agg(count(lit(1)).as("__pcnt"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__pcnt")), lit(0L)).as("__off"))
    val ordered = ranked.join(broadcast(offsets), "__pid")
      .withColumn("__row_id",
        (lit(batchId) * lit(1L << 32) + col("__off") + col("__lrn")).cast("long"))
      .drop("__pid", "__lrn", "__off")
    (ordered, () => { ranked.unpersist(false); () })
  }

  /** Compact when ≥ mergeThreshold live batches exist. Also retires any
    * batch dir a previous crash left behind after its segment committed.
    */
  def maybeCompact(spark: SparkSession): Unit = {
    retireCoveredDirs()
    val live = liveBatches()
    if (live.size >= mergeThreshold && live.nonEmpty) compact(spark, live)
  }

  /** Merge the given committed batches into one main segment in __row_id
    * order — the reference's `INSERT INTO main SELECT … FROM buffer ORDER
    * BY row_id; TRUNCATE buffer`. Idempotent: a replayed segment move
    * keeps the existing committed segment.
    */
  private def compact(spark: SparkSession, batches: Set[Long]): Unit = {
    val segId = batches.max
    val staging = new HPath(root, s"_staging/seg-$segId")
    val target = new HPath(mainDir, s"seg-$segId")
    if (!StateFs.exists(target)) {
      val dirs = batches.toSeq.sorted.map(b => s"$tableDir/batch=$b")
      segmentMerge(spark.read.parquet(dirs: _*))
        .sort(col("__row_id"))
        .write.mode("overwrite").parquet(staging.toString)
      // coverage metadata INSIDE the staged segment: data + the record of
      // what it replaces become visible in the same atomic move.
      StateFs.writeFile(new HPath(staging, "_batches"),
        batches.toSeq.sorted.mkString("", "\n", "\n"))
      // lost move = a concurrent replay committed the segment first
      if (!StateFs.commitMove(staging, target)) StateFs.delete(staging)
    }
    retireCoveredDirs()
  }

  /** Delete any live batch dir whose id a committed segment covers —
    * normal post-compaction cleanup AND lazy crash repair.
    */
  private def retireCoveredDirs(): Unit =
    compactedBatches().foreach { b =>
      StateFs.delete(new HPath(root, s"batch=$b"))
    }

  /** Number of live batch dirs on disk (bounded by mergeThreshold when
    * compaction is on — the test handle for "file growth is bounded").
    */
  def liveBatchDirCount(): Int =
    StateFs.listNames(root).count(_.startsWith("batch="))

  /** Everything committed: main segments ∪ live batch dirs, `__row_id`
    * included (total arrival order across the whole landed log). Pass the
    * change-relation schema to project/type the CDC columns exactly; the
    * `__row_id` column rides along either way.
    */
  def readCommitted(spark: SparkSession, schema: StructType = null): DataFrame = {
    val segs = segDirs().map(_.toString)
    val live = liveBatches().toSeq.sorted.map(b => new HPath(root, s"batch=$b"))
      .filter(StateFs.exists).map(_.toString)
    val dirs = segs ++ live
    val reader = if (schema == null) spark.read else {
      val withRowId = StructType(schema.fields :+
        org.apache.spark.sql.types.StructField("__row_id",
          org.apache.spark.sql.types.LongType, nullable = true))
      spark.read.schema(withRowId)
    }
    if (dirs.isEmpty) {
      require(schema != null, "empty sink and no schema to shape an empty result")
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schema.fields :+ org.apache.spark.sql.types.StructField("__row_id",
          org.apache.spark.sql.types.LongType, nullable = true)))
    } else reader.parquet(dirs: _*)
  }

  /** foreachBatch adapter: `stream.writeStream.foreachBatch(sink.forEachBatch _)`. */
  def forEachBatch(batch: DataFrame, batchId: Long): Unit = {
    writeBatch(batch, batchId); ()
  }
}
