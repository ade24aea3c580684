package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch CDC-apply operators over a [[ChangeRelation]] — the engine's
  * re-expression of pg2ch's three table-engine semantics
  * (`pkg/tableengines/{mergetree,replacingmergetree,collapsingmergetree}
  * .go` [recall:med]; SURVEY.md §2.A6–A8). The `cdc_*` declared queries
  * exercise the same algebra over the events table; these functions give
  * the general form over arbitrary key/row structs, and the streaming path
  * reuses them inside foreachBatch (see [[BufferedSink]]).
  *
  * Scale notes: every apply is a single hash shuffle on the key columns.
  * applyReplacing uses max_by-style window; applyCollapsing is partial-agg
  * friendly (sum of signs). Nothing here sorts globally.
  */
object CdcApply {

  /** A9 truncate: a pgoutput `T` message wipes the target and buffer
    * tables (the reference truncates both on receipt — SURVEY §2.A9). In
    * the change-relation algebra that means only changes whose LSN is
    * AFTER the table's LAST truncate survive; the `T` rows themselves
    * carry no data and are dropped.
    *
    * Scale shape: truncates are rare, so the per-table frontier relation
    * aggregates to ≤ #tables rows — broadcast it back and the change
    * stream itself never shuffles. (A window over `table` would funnel
    * the whole stream into #tables partitions.)
    */
  def dropTruncated(changes: DataFrame): DataFrame = {
    val frontiers = changes
      .filter(col("op") === ChangeRelation.OpTruncate)
      .groupBy(col("table").as("__t"))
      .agg(max(col("lsn")).as("__tmax"))
    changes
      .filter(col("op") =!= ChangeRelation.OpTruncate)
      .join(broadcast(frontiers), col("table") === col("__t"), "left")
      .filter(col("__tmax").isNull || col("lsn") > col("__tmax"))
      .drop("__t", "__tmax")
  }

  /** MergeTree append: inserts only; U/D are not supported by the plain
    * engine (the reference rejects them at config time — SURVEY §2.A6).
    * Truncate-aware: inserts before a table's last `T` event are wiped.
    */
  def applyAppend(changes: DataFrame): DataFrame =
    dropTruncated(changes)
      .filter(col("op") === ChangeRelation.OpInsert).select(col("after.*"))

  /** ReplacingMergeTree FINAL: latest version (= LSN) per key wins;
    * a DELETE tombstone removes the key entirely. Truncate-aware.
    */
  def applyReplacing(changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(k => col(s"key_$k")): _*).orderBy(col("lsn").desc)
    val keyed = dropTruncated(changes).withColumns(
      keyCols.map(k => s"key_$k" ->
        coalesce(col(s"after.$k"), col(s"before.$k"))).toMap)
    keyed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= ChangeRelation.OpDelete)
      .select(col("after.*"))
  }

  /** CollapsingMergeTree: signed row pairs; rows whose sign-sum collapses
    * to 0 vanish, survivors are the net +1 row values.
    * Emits the signed physical stream (what the reference buffers to CH).
    * Truncate-aware: pre-truncate history never enters the signed stream.
    */
  def toSignedRows(changes0: DataFrame): DataFrame = {
    val changes = dropTruncated(changes0)
    val ins = changes.filter(col("op") === ChangeRelation.OpInsert)
      .select(col("lsn"), col("after").as("row"), lit(1).as("sign"))
    val updOld = changes.filter(col("op") === ChangeRelation.OpUpdate)
      .select(col("lsn"), col("before").as("row"), lit(-1).as("sign"))
    val updNew = changes.filter(col("op") === ChangeRelation.OpUpdate)
      .select(col("lsn"), col("after").as("row"), lit(1).as("sign"))
    val del = changes.filter(col("op") === ChangeRelation.OpDelete)
      .select(col("lsn"), col("before").as("row"), lit(-1).as("sign"))
    ins.unionByName(updOld).unionByName(updNew).unionByName(del)
  }

  /** Read-side collapse of the signed stream: groupBy full row value,
    * keep sum(sign) != 0 — ClickHouse's merge-time collapse as one agg.
    */
  def collapse(signed: DataFrame): DataFrame =
    signed.groupBy(col("row"))
      .agg(sum(col("sign")).as("net"))
      .filter(col("net") =!= 0)
      .select(col("row.*"))

  /** Within-segment merge — ClickHouse's background part-merge analog:
    * when buffer batches compact into a main segment, a ReplacingMergeTree
    * table's segment can drop every change row superseded by a same-key,
    * higher-LSN change IN THE SAME slice (CH merges parts by applying the
    * engine inside the part; read-side FINAL across parts is still
    * needed, exactly like [[applyReplacing]] here). Truncate markers all
    * survive, and a dropped row is by construction never a key's global
    * maximum, so `readFinal` is bit-identical — the merge only bounds log
    * growth to O(live keys + churn since last compaction) instead of
    * O(all history). Non-replacing engines return the slice unchanged:
    * append needs every row, and collapsing pair-cancellation is only
    * sound between truncate boundaries — not worth the subtlety here.
    */
  def mergeSlice(slice: DataFrame, engine: String, keyCols: Seq[String]): DataFrame =
    engine match {
      case "ReplacingMergeTree" =>
        val truncates = slice.filter(col("op") === ChangeRelation.OpTruncate)
        val keyed = slice.filter(col("op") =!= ChangeRelation.OpTruncate)
          .withColumns(keyCols.map(k => s"__key_$k" ->
            coalesce(col(s"after.$k"), col(s"before.$k"))).toMap)
        // deterministic tiebreak: equal-LSN changes to one key (snapshot
        // rows land at lsn=0) would otherwise keep an arbitrary winner and
        // compaction would not be bit-stable. __row_id is always present in
        // a compaction slice (BufferedSink stamps it at write time); fall
        // back to lsn-only for direct library calls on bare change logs.
        val tiebreak =
          if (slice.columns.contains("__row_id")) Seq(col("__row_id").desc)
          else Seq.empty
        val w = Window
          .partitionBy(keyCols.map(k => col(s"__key_$k")): _*)
          .orderBy(col("lsn").desc +: tiebreak: _*)
        keyed
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop(keyCols.map(k => s"__key_$k") :+ "__rn": _*)
          .unionByName(truncates)
      case _ => slice
    }

  /** A12 restart dedup: drop redelivered changes at-or-below the persisted
    * per-table LSN frontier. Idempotent replay = filter + apply.
    */
  def dropReplayed(changes: DataFrame, frontier: Long): DataFrame =
    changes.filter(col("lsn") > frontier)

  /** The LSN frontier after applying a batch (max commit LSN). */
  def frontierOf(changes: DataFrame): Column = max(col("lsn"))
}
