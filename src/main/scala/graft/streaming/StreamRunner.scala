package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** The reference's main loop as one library entry point (SURVEY.md §3.2,
  * §3.4): configure tables + engines, start replication, get continuously
  * maintained targets.
  *
  * pg2ch: config file lists `tables.<t>.{main_table, engine, buffer_size,
  * merge_threshold}`; `replicator.Run()` tails the slot, routes decoded
  * rows to per-table engines, buffers, flushes, persists LSN
  * (`cmd/pg2ch/main.go`, `pkg/replicator` [recall:high] — SURVEY §0: paths
  * from public-repo knowledge, /root/reference is empty).
  *
  * Spark mapping: one streaming query PER TABLE (the reference's
  * single-writer-per-table invariant), each reading the shared WAL feed
  * directory, filtering its own relation, and landing the raw change log
  * through [[BufferedSink]]'s two-phase batchId-idempotent commit. The
  * target table semantics (Replacing FINAL / Collapsing net / append) are
  * applied AT READ TIME over the landed log — exactly ClickHouse's
  * merge-on-read model — via [[readFinal]]. Checkpoint offsets are the
  * persisted LSN; restart resumes exactly-once (StreamLifecycleSpec).
  */
object StreamRunner {

  /** Per-table replication config — the Spark-native form of the
    * reference's `tables.<name>` block.
    *
    * `bufferSize` is pg2ch's per-table flush threshold (rows buffered
    * before a flush). Structured Streaming batches by trigger + source
    * chunking rather than row count, so it maps onto the file source's
    * `maxFilesPerTrigger` batching knob (>0 → that many feed files per
    * micro-batch) — advisory, not a hard row bound.
    */
  final case class TableConfig(
      name: String,
      engine: String, // MergeTree | ReplacingMergeTree | CollapsingMergeTree
      keyColumns: Seq[String],
      rowSchema: StructType,
      bufferSize: Int = 0,
      // pgoutput relation OID for binary feeds — the static relid→table
      // registry a streaming decode needs (the batch path can derive it
      // from the feed's R frames instead; see ChangeFeed.fromBinaryFrames)
      relId: Int = -1)

  final case class RunnerConfig(
      inputDir: String, // JSON-lines WAL feed directory (readStream.text)
      outputDir: String, // sink root; one subdir per table
      checkpointDir: String,
      tables: Seq[TableConfig],
      // A11: promote buffer batches into main/ every N flushes (0 = never)
      mergeThreshold: Int = 0,
      // pg2ch's inactivity_flush_timeout → Trigger.ProcessingTime: fire a
      // micro-batch on this cadence even when the feed idles (SURVEY §3.4)
      inactivityFlushMs: Option[Long] = None,
      // "json" (JSON-lines stand-in) | "pgoutput" (binary frames, base64
      // text lines per frame — the reference's actual wire shape, A3)
      feedFormat: String = "json",
      // ClickHouse HTTP endpoint: when set, every landed batch is ALSO
      // shipped engine-encoded over INSERT … FORMAT TabSeparated (A10's
      // wire half; same batchId idempotency as the landing)
      clickhouseUrl: Option[String] = None,
      // CH background-merge analog: apply the table engine's row
      // reduction inside each compacted segment (CdcApply.mergeSlice).
      // Off by default — pg2ch copies buffer rows verbatim; ClickHouse's
      // own merges do the reducing. readFinal is identical either way.
      mergeOnCompact: Boolean = false)

  private def sinkFor(cfg: RunnerConfig, table: String): BufferedSink = {
    val segMerge: DataFrame => DataFrame =
      if (cfg.mergeOnCompact)
        cfg.tables.find(_.name == table)
          .map(tc => CdcApply.mergeSlice(_: DataFrame, tc.engine, tc.keyColumns))
          .getOrElse(identity[DataFrame] _)
      else identity[DataFrame] _
    new BufferedSink(s"${cfg.outputDir}/$table", cfg.mergeThreshold,
      segmentMerge = segMerge)
  }

  /** Start one streaming query per configured table. */
  def run(spark: SparkSession, cfg: RunnerConfig): Seq[StreamingQuery] =
    cfg.tables.map { tc =>
      val sink = sinkFor(cfg, tc.name)
      val reader = spark.readStream
      if (tc.bufferSize > 0) reader.option("maxFilesPerTrigger", tc.bufferSize)
      val decoded = cfg.feedFormat match {
        case "json" =>
          ChangeFeed.fromJsonLines(reader.text(cfg.inputDir), tc.rowSchema)
        case "pgoutput" =>
          val rels = cfg.tables.filter(_.relId >= 0)
            .map(t => t.relId -> t.name).toMap
          require(rels.nonEmpty,
            "pgoutput feed needs relid set on the configured tables")
          ChangeFeed.fromBase64Frames(reader.text(cfg.inputDir), tc.rowSchema,
            relations = rels)
        case other =>
          throw new IllegalArgumentException(s"unknown feed_format: $other")
      }
      val chSink = cfg.clickhouseUrl.map(url =>
        new graft.sinks.HttpCHSink(url, s"${cfg.outputDir}/_ch_state"))
      val writer = decoded
        .filter(col("table") === tc.name)
        .writeStream
        .queryName(s"graft_replicate_${tc.name}")
        .option("checkpointLocation", s"${cfg.checkpointDir}/${tc.name}")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          sink.writeBatch(batch, batchId)
          // ship AFTER the landing commits: both layers are idempotent on
          // batchId, so a crash between them replays into two no-ops
          chSink.foreach(_.insert(encodeForCH(tc, batch), tc.name, batchId))
          ()
        }
      cfg.inactivityFlushMs.foreach(ms =>
        writer.trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(ms)))
      writer.start()
    }

  /** Engine wire encoding for the ClickHouse buffer table — the aux
    * columns pg2ch attaches before shipping (SURVEY §1.1): Replacing rows
    * carry `ver = LSN` plus a `deleted` flag (ReplacingMergeTree(ver,
    * is_deleted) form, so DELETE ships the old tuple as a tombstone);
    * Collapsing ships the signed ±1 row pairs; plain MergeTree appends
    * inserts only. Truncate markers never ship — pg2ch truncates the CH
    * tables on receipt instead, and the landed log already frontier-drops.
    */
  def encodeForCH(tc: TableConfig, changes: DataFrame): DataFrame = {
    val rowCols = tc.rowSchema.fieldNames.toSeq
    tc.engine match {
      case "ReplacingMergeTree" =>
        val live = changes.filter(col("op") =!= ChangeRelation.OpTruncate)
        val upserts = live
          .filter(col("op") =!= ChangeRelation.OpDelete)
          .select(rowCols.map(c => col(s"after.$c")) ++
            Seq(col("lsn").as("ver"), lit(0).as("deleted")): _*)
        val tombstones = live
          .filter(col("op") === ChangeRelation.OpDelete)
          .select(rowCols.map(c => col(s"before.$c")) ++
            Seq(col("lsn").as("ver"), lit(1).as("deleted")): _*)
        upserts.unionByName(tombstones)
      case "CollapsingMergeTree" =>
        CdcApply.toSignedRows(changes)
          .select(rowCols.map(c => col(s"row.$c")) :+ col("sign"): _*)
      case "MergeTree" =>
        CdcApply.applyAppend(changes)
      case other => throw new IllegalArgumentException(s"unknown engine: $other")
    }
  }

  /** The landed change log for a table: main segments ∪ live buffer
    * batches — identical rows whether or not compaction has run.
    */
  def changeLog(spark: SparkSession, cfg: RunnerConfig, table: String): DataFrame =
    sinkFor(cfg, table)
      .readCommitted(spark, ChangeRelation.schema(
        cfg.tables.find(_.name == table).get.rowSchema))
      .drop("__row_id")

  /** Read-side FINAL — the reference's target-table semantics applied
    * over the landed log (truncate-aware via CdcApply.dropTruncated,
    * which every apply composes).
    */
  def readFinal(spark: SparkSession, cfg: RunnerConfig, table: String): DataFrame = {
    val tc = cfg.tables.find(_.name == table)
      .getOrElse(throw new IllegalArgumentException(s"unconfigured table: $table"))
    val log = changeLog(spark, cfg, table)
    tc.engine match {
      case "ReplacingMergeTree" => CdcApply.applyReplacing(log, tc.keyColumns)
      case "CollapsingMergeTree" => CdcApply.collapse(CdcApply.toSignedRows(log))
      case "MergeTree" => CdcApply.applyAppend(log)
      case other => throw new IllegalArgumentException(s"unknown engine: $other")
    }
  }
}
