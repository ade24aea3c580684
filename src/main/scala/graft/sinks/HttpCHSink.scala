package graft.sinks

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import graft.functions.TsvCodec

/** HTTP ClickHouse sink — the wire half the reference actually ships over:
  * `POST /?query=INSERT INTO <table> FORMAT TabSeparated` with a body of
  * escaped TSV lines (pg2ch `pkg/utils/chutils` HTTP insert [recall:med];
  * SURVEY.md §2.A10 — §0 caveat applies). Byte-identical lines to
  * [[FsCHSink]]: both encode through [[TsvCodec.tsvLine]].
  *
  * Scale shape: the TSV encode is a codegen'd projection and the POSTs
  * happen per PARTITION on the executors (`foreachPartition`) — rows
  * never collect to the driver, and a 1000-executor job opens 1000
  * parallel inserts exactly like a fleet of pg2ch writers.
  *
  * Exactly-once: two layers, both modeled on the real systems.
  *  - Client side, pg2ch's persisted-LSN skip: a local manifest of shipped
  *    (table, batchId); a redelivered foreachBatch is a no-op.
  *  - Server side, ClickHouse's insert-block dedup (replicated tables drop
  *    re-inserted identical blocks): every POST carries
  *    `X-Graft-Batch`/`X-Graft-Partition`, so a crash between a partial
  *    ship and the manifest append re-POSTs blocks the server can
  *    deduplicate by key — the same contract CH gives pg2ch.
  *
  * No ClickHouse exists in this environment; CHSinkSpec drives this
  * against an embedded JDK HttpServer speaking the same surface.
  */
final class HttpCHSink(endpoint: String, stateDir: String) extends CHSink {

  private def manifest(table: String) = Paths.get(stateDir, table, "_shipped_batches")

  def committedBatches(table: String): Set[Long] = {
    val m = manifest(table)
    if (Files.exists(m))
      Files.readAllLines(m).toArray(Array.empty[String])
        .filter(_.nonEmpty).map(_.toLong).toSet
    else Set.empty
  }

  override def insert(batch: DataFrame, table: String, batchId: Long): Boolean = {
    if (committedBatches(table).contains(batchId)) return false
    val line = TsvCodec.tsvLineFor(batch)
    val url = endpoint // capture primitives, not `this`, into the closure
    val tbl = table
    val bid = batchId
    batch.select(line.as("value")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val body = rows.map(_.getString(0)).mkString("", "\n", "\n")
        if (body != "\n") { // empty partitions ship nothing
          val part = Option(TaskContext.get()).map(_.partitionId()).getOrElse(0)
          HttpCHSink.post(url, tbl, bid, part, body)
        }
    }
    val m = manifest(table)
    Files.createDirectories(m.getParent)
    Files.write(m, s"$batchId\n".getBytes(UTF_8),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    true
  }
}

object HttpCHSink {

  /** One partition's insert: `POST <endpoint>/?query=INSERT INTO <table>
    * FORMAT TabSeparated`. Runs on executors; throws on any non-2xx
    * status so a failed ship fails the Spark task (and the batch — the
    * manifest line is only appended after every partition succeeded).
    */
  private[sinks] def post(endpoint: String, table: String, batchId: Long,
                          partition: Int, body: String): Unit = {
    val query = URLEncoder.encode(s"INSERT INTO $table FORMAT TabSeparated", UTF_8)
    val conn = new URI(s"$endpoint/?query=$query").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "text/tab-separated-values")
      conn.setRequestProperty("X-Graft-Batch", batchId.toString)
      conn.setRequestProperty("X-Graft-Partition", partition.toString)
      val out = conn.getOutputStream
      try out.write(body.getBytes(UTF_8)) finally out.close()
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"ClickHouse insert failed: HTTP $code")
      // drain so keep-alive connections can be reused
      val in = conn.getInputStream
      try { while (in.read() != -1) () } finally in.close()
    } finally conn.disconnect()
  }
}
