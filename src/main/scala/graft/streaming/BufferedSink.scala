package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame

/** Two-phase, exactly-once micro-batch sink — the Spark-native form of the
  * reference's buffer-table flush pipeline (SURVEY.md §2.A10–A13).
  *
  * pg2ch buffers rows in memory, flushes them into a ClickHouse staging
  * ("buffer") table, and every `merge_threshold` flushes promotes them into
  * the main table in `row_id` order, truncating the buffer; the replication
  * slot is only acked after the flush succeeds, and restart replays are
  * dropped via the persisted LSN (`pkg/tableengines/generic.go`
  * FlushToMainTable, `pkg/consumer` standby-status [recall:med] — SURVEY §0
  * caveat applies).
  *
  * Spark mapping: `foreachBatch` hands us (batch, batchId); we stage the
  * batch to `_staging/<batchId>`, atomically rename into the committed
  * area, and record the batchId in a manifest. A redelivered batchId
  * (checkpoint replay after crash) is a no-op — the manifest is the
  * equivalent of the reference's persisted LSN. ClickHouse itself is not
  * in this environment, so the writer targets a filesystem table layout;
  * the TSV wire encoding lives in graft.functions.TsvCodec.
  */
final class BufferedSink(tableDir: String) {

  private val committed = Paths.get(tableDir, "_committed_batches")

  def committedBatches(): Set[Long] =
    if (Files.exists(committed))
      Files.readAllLines(committed).toArray(Array.empty[String])
        .filter(_.nonEmpty).map(_.toLong).toSet
    else Set.empty

  /** Idempotent micro-batch write: stage → atomic move → manifest append.
    * Safe to call again with the same batchId (crash-replay path).
    */
  def writeBatch(batch: DataFrame, batchId: Long): Boolean = {
    if (committedBatches().contains(batchId)) return false
    val staging = Paths.get(tableDir, "_staging", batchId.toString)
    val target = Paths.get(tableDir, s"batch=$batchId")
    batch.write.mode("overwrite").parquet(staging.toString)
    Files.createDirectories(target.getParent)
    if (Files.exists(target)) { // crashed between move and manifest: keep it
      deleteRecursively(staging)
    } else {
      Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    }
    Files.createDirectories(committed.getParent)
    // append ONE line per batch (single short write ≈ atomic on a local
    // fs): a full rewrite would be O(batches²) I/O over a long stream and a
    // crash mid-rewrite could truncate previously committed ids.
    Files.write(committed, s"$batchId\n".getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    true
  }

  /** foreachBatch adapter: `stream.writeStream.foreachBatch(sink.forEachBatch _)`. */
  def forEachBatch(batch: DataFrame, batchId: Long): Unit = {
    writeBatch(batch, batchId); ()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
