package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's main loop as one library entry point (SURVEY.md §3.2,
  * §3.4): configure tables + engines, start replication, get continuously
  * maintained targets.
  *
  * pg2ch: config file lists `tables.<t>.{main_table, engine, buffer_size,
  * merge_threshold}`; `replicator.Run()` tails the slot ONCE, decodes each
  * message once, and routes the decoded row to its table's engine by
  * relation OID (`cmd/pg2ch/main.go`, `pkg/replicator`/`pkg/consumer`
  * [recall:high] — SURVEY §0: paths from public-repo knowledge,
  * /root/reference is empty).
  *
  * Spark mapping — SINGLE-DECODE ROUTED TOPOLOGY: one streaming query
  * reads the shared WAL feed; inside `foreachBatch` the micro-batch is
  * decoded ONCE into the untyped change relation ([[ChangeFeed]] raw
  * layer, persisted in memory), then routed to every configured table as
  * a cheap typed projection + [[BufferedSink]] two-phase batchId-
  * idempotent landing. N configured tables cost ONE feed read + decode
  * per micro-batch, not N — at a 100-table feed the per-table-query
  * alternative re-reads and re-decodes the same WAL 100×, which is the
  * first thing a real deployment hits (VERDICT r03 item 1).
  *
  * Crash semantics are unchanged from the per-table shape: each
  * (table, batchId) landing is independently idempotent, so a crash
  * mid-route replays the batch and already-landed tables no-op — the
  * same contract pg2ch gets from its persisted per-table LSN. The target
  * table semantics (Replacing FINAL / Collapsing net / append) are
  * applied AT READ TIME over the landed log — exactly ClickHouse's
  * merge-on-read model — via [[readFinal]].
  */
object StreamRunner {

  /** Per-table replication config — the Spark-native form of the
    * reference's `tables.<name>` block.
    *
    * `bufferSize` is pg2ch's per-table flush threshold (rows buffered
    * before a flush). Structured Streaming batches by trigger + source
    * chunking rather than row count, so it maps onto the file source's
    * `maxFilesPerTrigger` batching knob — advisory, not a hard row bound;
    * the routed (single-query) topology applies the SMALLEST configured
    * value, since one shared query cannot batch per table.
    *
    * `columnsMap` is pg2ch's `tables.<t>.columns` subset/rename
    * [recall:med]: target column name → feed column name. `rowSchema`
    * describes the TARGET columns; each reads the feed cell named
    * `columnsMap(target)` (default: its own name), and feed columns not
    * mapped by any target are dropped.
    */
  final case class TableConfig(
      name: String,
      engine: String, // MergeTree | ReplacingMergeTree | CollapsingMergeTree
      keyColumns: Seq[String],
      rowSchema: StructType,
      bufferSize: Int = 0,
      // pgoutput relation OID for binary feeds — the static relid→table
      // registry a streaming decode needs before the feed's own R frames
      // arrive (those supersede it; see ChangeFeed.rawFromFrames)
      relId: Int = -1,
      columnsMap: Map[String, String] = Map.empty,
      // per-table compaction override (pg2ch configures merge_threshold
      // per table); None → the runner-level default
      mergeThreshold: Option[Int] = None) {

    /** Feed-side column names, in target-field order (the static relation
      * definition's column list for binary feeds).
      */
    def feedColumns: Seq[String] =
      rowSchema.fieldNames.toSeq.map(n => columnsMap.getOrElse(n, n))
  }

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
      // wire half; same batchId idempotency as the landing), and a
      // truncate event truncates the CH mirror first — pg2ch truncates
      // the CH tables on receipt of a T message (SURVEY §2.A9).
      clickhouseUrl: Option[String] = None,
      // CH background-merge analog: apply the table engine's row
      // reduction inside each compacted segment (CdcApply.mergeSlice).
      // Off by default — pg2ch copies buffer rows verbatim; ClickHouse's
      // own merges do the reducing. readFinal is identical either way.
      mergeOnCompact: Boolean = false,
      // replication-socket source (`source_wire: host:port`): when set,
      // Replicator.wireClient builds the PgWireClient that lands WAL
      // into inputDir — pg2ch's PG connection params slot (A2's wire
      // half; absent = the feed directory is populated externally)
      sourceWire: Option[(String, Int)] = None,
      // SCRAM-SHA-256 / MD5 password for the wire source
      // (`source_password:`); absent = the peer must grant trust auth
      sourcePassword: Option[String] = None,
      // replication role name (`source_user:`, default "graft") — also
      // the salt half of the legacy MD5 double-hash
      sourceUser: String = "graft",
      // libpq sslmode ladder for the wire source (`source_ssl:
      // disable|require|verify-ca|verify-full`) plus the sslrootcert
      // analogue (`source_ssl_truststore:` PKCS12 path,
      // `source_ssl_truststore_password:`)
      sourceSsl: String = "disable",
      sourceSslTrustStore: Option[String] = None,
      sourceSslTrustStorePassword: String = "changeit",
      // which password-auth requests the wire client answers:
      // any (libpq default) | scram (refuse the MD5 downgrade) | md5
      sourceAuth: String = "any")

  private[streaming] def sinkFor(cfg: RunnerConfig, table: String): BufferedSink = {
    val tc = cfg.tables.find(_.name == table)
    val segMerge: DataFrame => DataFrame =
      if (cfg.mergeOnCompact)
        tc.map(t => CdcApply.mergeSlice(_: DataFrame, t.engine, t.keyColumns))
          .getOrElse(identity[DataFrame] _)
      else identity[DataFrame] _
    val threshold = tc.flatMap(_.mergeThreshold).getOrElse(cfg.mergeThreshold)
    new BufferedSink(s"${cfg.outputDir}/$table", threshold,
      segmentMerge = segMerge)
  }

  /** Start replication: ONE streaming query for every configured table
    * (returned as a single-element Seq — callers iterate regardless).
    */
  def run(spark: SparkSession, cfg: RunnerConfig): Seq[StreamingQuery] = {
    val sinks = cfg.tables.map(tc => tc.name -> sinkFor(cfg, tc.name)).toMap
    val chSink = cfg.clickhouseUrl.map(url =>
      new graft.sinks.HttpCHSink(url, s"${cfg.outputDir}/_ch_state"))
    val reader = spark.readStream
    cfg.tables.map(_.bufferSize).filter(_ > 0).reduceOption(_ min _)
      .foreach(n => reader.option("maxFilesPerTrigger", n))
    val writer = reader.text(cfg.inputDir)
      .writeStream
      .queryName("graft_replicate")
      .option("checkpointLocation", s"${cfg.checkpointDir}/_routed")
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        routeBatch(spark, cfg, sinks, chSink, rawBatch, batchId)
      }
    cfg.inactivityFlushMs.foreach(ms => writer.trigger(Trigger.ProcessingTime(ms)))
    Seq(writer.start())
  }

  /** One micro-batch: decode once, route to every table's sink.
    *
    * The decoded relation is persisted for the duration of the route, so
    * table 2..N replay an in-memory projection, never the parse. For
    * binary feeds the feed's `R` frames are also landed in a relation
    * cache (`_relations/` parquet — pg2ch's live relation map, which must
    * survive across micro-batches because a subscription sends each
    * table's R frame ONCE, not once per batch). The cache is a versioned
    * full snapshot per R-bearing batch (see [[writeRelationCache]]) and
    * replay-safe twice over: the version move is idempotent, and
    * definitions are LSN-versioned so re-merging the same defs changes
    * nothing at resolution time.
    */
  private def routeBatch(spark: SparkSession, cfg: RunnerConfig,
                         sinks: Map[String, BufferedSink],
                         chSink: Option[graft.sinks.HttpCHSink],
                         rawBatch: DataFrame, batchId: Long): Unit = {
    val cleanup = scala.collection.mutable.ListBuffer.empty[() => Unit]
    try {
      val decoded = (cfg.feedFormat match {
        case "json" => ChangeFeed.fromJsonLinesRaw(rawBatch)
        case "pgoutput" =>
          val frames = ChangeFeed.parseBase64Frames(rawBatch)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cleanup += (() => { frames.unpersist(); () })
          val cacheDir = new HPath(cfg.outputDir, "_relations")
          val cachedBefore = readRelationCache(spark, cacheDir)
          val feedDefs = ChangeFeed.relationDefs(frames)
          if (!feedDefs.isEmpty)
            writeRelationCache(spark, cacheDir, batchId,
              cachedBefore.fold(feedDefs)(_.unionByName(feedDefs)))
          val cached = readRelationCache(spark, cacheDir)
          val static = ChangeFeed.staticDefs(spark,
            cfg.tables.filter(_.relId >= 0)
              .map(tc => (tc.relId, tc.name, tc.feedColumns)))
          val extra = cached.fold(static)(_.unionByName(static))
          ChangeFeed.rawFromFrames(frames, extra)
        case other =>
          throw new IllegalArgumentException(s"unknown feed_format: $other")
      }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cleanup += (() => { decoded.unpersist(); () })

      // ONE aggregate over the persisted decoded batch yields every
      // table's truncate flag — the per-table `isEmpty` probe was N extra
      // jobs per micro-batch in the routed topology. The set is at most
      // |tables| strings, so the collect is driver-trivial.
      val truncatedTables: Set[String] =
        if (chSink.isEmpty) Set.empty
        else decoded.filter(col("op") === ChangeRelation.OpTruncate)
          .select(col("table")).distinct()
          .collect().map(_.getString(0)).toSet

      cfg.tables.foreach { tc =>
        val typedBatch = ChangeFeed.typed(
          decoded.filter(col("table") === tc.name), tc.rowSchema, tc.columnsMap)
        sinks(tc.name).writeBatch(typedBatch, batchId)
        // ship AFTER the landing commits: both layers are idempotent on
        // batchId, so a crash between them replays into two no-ops
        chSink.foreach { ch =>
          ch.insert(encodeForCH(tc, typedBatch), tc.name, batchId,
            truncateFirst = truncatedTables.contains(tc.name))
        }
      }
    } finally cleanup.foreach(_.apply())
  }

  /** The R-definition cache is VERSIONED full snapshots, not an append
    * log: each R-bearing batch writes the complete definition set to
    * `_relations/v=<batchId>` (staged + atomic move — replay keeps the
    * committed version) and retires older versions, so reads open ONE
    * tiny parquet dir regardless of how many schema changes the feed has
    * ever carried. An append-per-batch layout would re-open an
    * ever-growing file list on every micro-batch — the same small-file
    * failure BufferedSink's compaction exists to prevent.
    */
  private def readRelationCache(spark: SparkSession,
                                cacheDir: HPath): Option[DataFrame] =
    latestCacheVersion(cacheDir).map(v =>
      spark.read.parquet(new HPath(cacheDir, s"v=$v").toString))

  private def latestCacheVersion(cacheDir: HPath): Option[Long] =
    StateFs.listNames(cacheDir)
      .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toLong }
      .maxOption

  private def writeRelationCache(spark: SparkSession, cacheDir: HPath,
                                 batchId: Long, defs: DataFrame): Unit = {
    val target = new HPath(cacheDir, s"v=$batchId")
    if (!StateFs.exists(target)) {
      val staging = new HPath(cacheDir, s"_staging_v$batchId")
      defs.distinct().coalesce(1).write.mode("overwrite").parquet(staging.toString)
      // lost move = a concurrent replay committed this version first
      if (!StateFs.commitMove(staging, target)) StateFs.delete(staging)
    }
    // retire superseded versions (lazy: a crash here just leaves one
    // extra dir for the next write to retire)
    latestCacheVersion(cacheDir).foreach { latest =>
      StateFs.listNames(cacheDir)
        .filter(n => n.startsWith("v=") && n.stripPrefix("v=").toLong < latest)
        .foreach(n => StateFs.delete(new HPath(cacheDir, n)))
    }
  }

  /** Engine wire encoding for the ClickHouse buffer table — the aux
    * columns pg2ch attaches before shipping (SURVEY §1.1): Replacing rows
    * carry `ver = LSN` plus a `deleted` flag (ReplacingMergeTree(ver,
    * is_deleted) form, so DELETE ships the old tuple as a tombstone);
    * Collapsing ships the signed ±1 row pairs; plain MergeTree appends
    * inserts only. Truncate markers never ship as rows — the sink issues
    * `TRUNCATE TABLE` on the CH side instead (see [[routeBatch]]) — and
    * every branch drops same-batch pre-truncate changes
    * ([[CdcApply.dropTruncated]]), so the mirror never retains rows the
    * landed log has frontier-dropped.
    */
  def encodeForCH(tc: TableConfig, changes: DataFrame): DataFrame = {
    val rowCols = tc.rowSchema.fieldNames.toSeq
    tc.engine match {
      case "ReplacingMergeTree" =>
        val live = CdcApply.dropTruncated(changes)
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
