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

  /** Decode a `value: Binary` pgoutput-shaped frame feed (the reference's
    * actual wire format — [[PgOutput]]) into the same [[ChangeRelation]]
    * as [[fromJsonLines]], with the same poison-pill policy.
    *
    * The protocol is stateful — `R` (relation) frames define relid→table
    * for subsequent tuple frames. Spark-native handling: when `relations`
    * is empty the mapping is derived FROM the feed (latest `R` per relid,
    * a tiny aggregate broadcast back over the tuple rows — the decode
    * itself never shuffles the change stream). Deriving it needs the `R`
    * frames visible in the same DataFrame, i.e. the batch path; a
    * streaming query passes the static `relations` registry instead
    * (pg2ch likewise keeps the live relation map outside the WAL loop).
    *
    * Tuple cells are PG text-format values cast positionally to
    * `rowSchema`'s types by Catalyst; `n`/`u` cells are null.
    */
  def fromBinaryFrames(raw: DataFrame, rowSchema: StructType,
                       dropMalformed: Boolean = true,
                       relations: Map[Int, String] = Map.empty): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val frames = raw.select(col("value")).as[Array[Byte]].map(PgOutput.parse)

    // relid → table name: static registry, or derived from R frames.
    val rels =
      if (relations.nonEmpty) relations.toSeq.toDF("relId", "relName")
      else frames.filter(f => f.tag == "R")
        .map(f => (f.relId, f.lsn.getOrElse(0L), f.relName))
        .toDF("relId", "rlsn", "relName")
        .groupBy("relId")
        .agg(expr("max_by(relName, rlsn)").as("relName"))

    // tuple/truncate frames → raw change rows (B/C framing and R frames
    // carry no row data). Malformed frames surface with null op/lsn.
    val rows = frames.flatMap { f =>
      f.tag match {
        case "I" | "U" | "D" =>
          Seq((f.lsn, f.tag, f.relId, Option(f.before), Option(f.after)))
        case "T" =>
          f.relIds.map(r => (f.lsn, "T", r,
            None: Option[Seq[String]], None: Option[Seq[String]]))
        case "B" | "C" | "R" => Seq.empty
        case _ => // malformed
          Seq((None: Option[Long], null: String, -1,
            None: Option[Seq[String]], None: Option[Seq[String]]))
      }
    }.toDF("lsn", "op", "relId", "bcells", "acells")

    def side(cells: String): org.apache.spark.sql.Column =
      when(col(cells).isNotNull, struct(rowSchema.fields.zipWithIndex.map {
        case (f, i) => element_at(col(cells), i + 1).cast(f.dataType).as(f.name)
      }: _*))

    val decoded = rows
      .join(broadcast(rels), rows("relId") === rels("relId"), "left")
      .select(col("lsn"), col("op"), col("relName").as("table"),
        side("bcells").as("before"), side("acells").as("after"))
    if (dropMalformed)
      decoded.filter(col("lsn").isNotNull && col("op").isNotNull &&
        col("table").isNotNull)
    else decoded
  }

  /** [[fromBinaryFrames]] over a base64 text feed — the file-directory
    * delivery of the binary wire format (a text line per frame survives
    * the line-oriented file stream source; a Kafka-shaped feed would hand
    * `fromBinaryFrames` its raw binary `value` column directly).
    */
  def fromBase64Frames(raw: DataFrame, rowSchema: StructType,
                       dropMalformed: Boolean = true,
                       relations: Map[Int, String] = Map.empty): DataFrame =
    fromBinaryFrames(raw.select(unbase64(col("value")).as("value")),
      rowSchema, dropMalformed, relations)
}
