package graft.streaming

import org.apache.spark.sql.types._

/** Canonical change relation — the Spark-native form of the reference's
  * decoded WAL stream (SURVEY.md §1.3).
  *
  * pg2ch decodes pgoutput messages into per-table row events framed by
  * Begin/Commit, with the LSN as the global ordering/progress token
  * (`pkg/decoder/decoder.go`, message types B C R I U D T [recall:high];
  * SURVEY §0: /root/reference was empty — layout from public-repo
  * knowledge). UPDATE/DELETE carry the full old tuple (REPLICA IDENTITY
  * FULL), which maps to the `before` struct here.
  *
  * `lsn` doubles as the Structured Streaming offset: a checkpointed query
  * over this relation restarts exactly where the reference's persisted
  * per-table LSN would (SURVEY §2.A12).
  */
object ChangeRelation {

  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"
  val OpTruncate = "T"

  /** Schema parameterized by the replicated table's row struct. */
  def schema(row: StructType): StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("before", row, nullable = true),
    StructField("after", row, nullable = true)))

  /** Fixture row struct used by tests (FIXTURES.md §3.1). */
  val testRow: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("amt", DecimalType(12, 2), nullable = true)))
}
