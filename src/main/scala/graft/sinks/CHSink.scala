package graft.sinks

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import graft.functions.TsvCodec
import graft.streaming.StateFs

/** ClickHouse-shaped sink (SURVEY.md §7.1 M4) — the "custom sink" half of
  * the reference's pipeline, behind an interface.
  *
  * pg2ch ships every buffered batch to ClickHouse as an HTTP
  * `INSERT INTO <table> FORMAT TabSeparated` POST body of escaped TSV
  * lines (`pkg/utils/chutils` HTTP insert [recall:med]; SURVEY §2.A10).
  * The wire encoding is [[TsvCodec]]; this trait is the shipping side.
  *
  * Scale shape: the TSV encode happens DISTRIBUTED (a codegen'd projection
  * to one string column), never on the driver. A real ClickHouse
  * implementation would `foreachPartition` + POST each partition's lines;
  * this environment has no ClickHouse, so [[FsCHSink]] lands the same
  * lines as text files with the same two-phase commit + batchId
  * idempotency the buffer-table path uses (SURVEY §2.A11–A12).
  */
trait CHSink {

  /** Idempotently ship one micro-batch of rows into `table`.
    *
    * `truncateFirst` = the batch carries a pgoutput `T` event: the sink
    * truncates the target table before inserting (pg2ch truncates the CH
    * tables on receipt of a Truncate message — SURVEY §2.A9). Both the
    * truncate and the insert sit under the same (table, batchId)
    * idempotency: a replayed batch re-truncates then re-inserts, which
    * converges to the identical end state.
    *
    * @return false iff this (table, batchId) was already shipped (replay).
    */
  def insert(batch: DataFrame, table: String, batchId: Long,
             truncateFirst: Boolean = false): Boolean

  /** foreachBatch adapter for a single-table stream:
    * `stream.writeStream.foreachBatch(sink.forEachBatch("t") _)`.
    */
  def forEachBatch(table: String)(batch: DataFrame, batchId: Long): Unit = {
    insert(batch, table, batchId); ()
  }
}

/** Filesystem TabSeparated sink: stage (distributed text write) → atomic
  * move into `rootDir/<table>/batch=<id>` → add the manifest marker.
  * Byte-compatible with ClickHouse TabSeparated: `\t` separators, `\n`
  * rows, `\\ \t \n` escaped, NULL as `\N`. State I/O goes through
  * [[graft.streaming.StateFs]], so `rootDir` may be any Hadoop
  * filesystem (HDFS/S3A/…), and the manifest is an append-free marker
  * directory — see StateFs for the object-store rationale.
  */
final class FsCHSink(rootDir: String) extends CHSink {

  private def manifest(table: String) =
    new HPath(s"$rootDir/$table", "_committed_batches")

  def committedBatches(table: String): Set[Long] =
    StateFs.markers(manifest(table))

  override def insert(batch: DataFrame, table: String, batchId: Long,
                      truncateFirst: Boolean = false): Boolean = {
    if (committedBatches(table).contains(batchId)) return false
    // truncateFirst is a no-op here by design: the Fs sink lands the raw
    // wire lines as an append-only log (a file-drop delivery, not a live
    // mirror); truncate semantics apply at the consuming end.
    val staging = new HPath(s"$rootDir/$table", s"_staging/$batchId")
    val target = new HPath(s"$rootDir/$table", s"batch=$batchId")
    val line = TsvCodec.tsvLineFor(batch)
    batch.select(line.as("value")).write.mode("overwrite").text(staging.toString)
    // lost move = crashed between a previous move and its marker: keep it
    if (!StateFs.commitMove(staging, target)) StateFs.delete(staging)
    StateFs.addMarker(manifest(table), batchId)
    true
  }
}
