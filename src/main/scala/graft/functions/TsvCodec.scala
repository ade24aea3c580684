package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse TabSeparated escape/unescape, re-expressed as codegen-friendly
  * Spark column expressions.
  *
  * The reference TSV-encodes every row it ships to ClickHouse, escaping
  * backslash, tab and newline, and writing SQL NULL as `\N`
  * (pg2ch `pkg/utils/chutils` [recall:med]; SURVEY.md §2.A5 — /root/reference
  * was empty at survey time, paths from public-repo knowledge).
  *
  * Built on `replace` (whole-stage codegen'd `StringReplace`) rather than a
  * Scala UDF so the hot encode path stays inside Tungsten codegen.
  * Escape order matters: backslash FIRST on escape, LAST on unescape.
  */
object TsvCodec {

  val Null = "\\N"

  /** Escape one string cell: \ -> \\, TAB -> \t, NL -> \n; NULL -> \N. */
  def escape(c: Column): Column = {
    val esc = replace(replace(replace(c, lit("\\"), lit("\\\\")),
      lit("\t"), lit("\\t")), lit("\n"), lit("\\n"))
    coalesce(esc, lit(Null))
  }

  /** Inverse of [[escape]]. `\N` (exactly) -> NULL.
    *
    * Plain replace would corrupt `\\t` (escaped backslash followed by t), so
    * unescape routes through a NUL sentinel: mark escaped backslashes first,
    * decode \t/\n, then restore backslashes. NUL never survives escape's
    * output alphabet in practice; roundtrip property-tested in TsvCodecSpec.
    */
  def unescape(c: Column): Column = {
    val sentinel = "\u0000"
    val s = replace(c, lit("\\\\"), lit(sentinel))
    val d = replace(replace(s, lit("\\t"), lit("\t")), lit("\\n"), lit("\n"))
    val out = replace(d, lit(sentinel), lit("\\"))
    when(c === lit(Null), lit(null: String)).otherwise(out)
  }

  /** Encode a full row of cells as one escaped TSV line. */
  def tsvLine(cells: Seq[Column]): Column =
    concat_ws("\t", cells.map(escape): _*)
}
