package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TsvCodec

/** Parser for PostgreSQL `COPY ... TO STDOUT` text output — the snapshot
  * wire format pg2ch reads during initial sync (SURVEY.md §2.A1, §3.1:
  * "parse COPY text rows (tab-separated, \N nulls)"; `pkg/utils` COPY row
  * parse [recall:med] — /root/reference was empty at survey time).
  *
  * Format contract (PG text COPY): one row per line; cells separated by
  * RAW tab; data tabs/newlines/backslashes escaped as `\t`/`\n`/`\\`;
  * SQL NULL is `\N`; booleans are `t`/`f`. Because real tabs and
  * newlines are always escaped, raw tab IS the cell delimiter and raw
  * newline IS the row delimiter — which is exactly what makes this
  * format splittable: `spark.read.text` hands out line-aligned file
  * splits, so a 100 TB COPY dump parses as one fully parallel map pass
  * (the distributed form of the reference's row-at-a-time loop), all in
  * codegen'd string expressions ([[TsvCodec.unescape]]) — no UDF.
  */
object CopyTsv {

  /** One typed cell: unescape (NULL = `\N`) then cast to the field type.
    * PG renders booleans as `t`/`f`, which Spark's string→boolean cast
    * accepts ONLY via its `t`/`f` literal forms — but map explicitly so
    * the contract doesn't lean on cast-table trivia.
    */
  private def cell(raw: Column, dt: DataType): Column = {
    val s = TsvCodec.unescape(raw)
    dt match {
      case BooleanType => when(s.isNull, lit(null).cast(BooleanType))
        .otherwise(s === lit("t"))
      case _ => s.cast(dt)
    }
  }

  /** Read a COPY text file (or directory of them) as `schema`-typed rows.
    * `split` keeps trailing empty cells (limit −1) so an empty-string
    * final column survives.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val cells = split(col("value"), "\t", -1)
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      cell(element_at(cells, i + 1), f.dataType).as(f.name)
    }
    spark.read.text(path).select(cols.toIndexedSeq: _*)
  }

  /** Render a DataFrame as COPY text lines (the inverse, for tests and
    * for feeding a PG-less fixture): every cell goes through the wire
    * rendering + escape the sink uses ([[TsvCodec]]), so
    * `read(write(df)) == df` is the A1-parse ↔ A5-encode roundtrip law.
    */
  def lines(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val wire = f.dataType match {
        case BooleanType => when(col(f.name).isNull, lit(null: String))
          .otherwise(when(col(f.name), lit("t")).otherwise(lit("f")))
        case _ => col(f.name).cast(StringType)
      }
      TsvCodec.escape(wire)
    }
    df.select(concat_ws("\t", cols.toIndexedSeq: _*).as("value"))
  }
}
