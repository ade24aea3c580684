package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Change-feed deserialization — the Spark-native form of the reference's
  * WAL decode stage (pg2ch `pkg/decoder/decoder.go` parses binary pgoutput
  * messages into typed row events [recall:high]; SURVEY.md §2.A3).
  *
  * Works identically on a batch DataFrame and a `readStream` source (file
  * directory, socket, or Kafka-shaped `value` column): one `from_json`
  * projection, fully codegen'd — the decode stage never shuffles.
  */
object ChangeFeed {

  /** Decode a `value: String` JSON-lines feed into a [[ChangeRelation]].
    * Malformed lines surface as null structs (PERMISSIVE), which
    * `dropMalformed = true` filters out — the reference would instead kill
    * the replication connection; we keep the poison-pill policy explicit.
    */
  def fromJsonLines(raw: DataFrame, rowSchema: StructType,
                    dropMalformed: Boolean = true): DataFrame = {
    val decoded = raw
      .select(from_json(col("value"), ChangeRelation.schema(rowSchema)).as("c"))
      .select(col("c.*"))
    if (dropMalformed) decoded.filter(col("lsn").isNotNull && col("op").isNotNull)
    else decoded
  }
}
