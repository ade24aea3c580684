package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** TSV escape/unescape roundtrip (FIXTURES.md §3.2, SURVEY §5.2(3)). */
class TsvCodecSpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def roundtrip(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    ss.toDF("s")
      .select(TsvCodec.unescape(TsvCodec.escape(col("s"))).as("r"))
      .collect().map(_.getString(0)).toSeq
  }

  private def escaped(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    ss.toDF("s").select(TsvCodec.escape(col("s")).as("e"))
      .collect().map(_.getString(0)).toSeq
  }

  test("fixture strings roundtrip (tabs, newlines, backslashes, literal \\N)") {
    val fixtures = Seq("a\tb", "a\nb", "a\\b", "a\\nb", "", "\\N-ish… ütf8 ☃",
      "ends with backslash\\", "\\\\double", "\t\n\\ all three",
      // ADVICE r07: CR and the rarer PG COPY control escapes
      "a\rb", "crlf\r\n", "a\\rb literal", "bs\bff\fvt", "\r")
    assert(roundtrip(fixtures) === fixtures)
  }

  test("SQL NULL encodes as \\N and decodes back to NULL") {
    import spark.implicits._
    val out = Seq[Option[String]](None).toDF("s")
      .select(TsvCodec.escape(col("s")).as("e"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("\\N"))
    val back = Seq("\\N").toDF("s")
      .select(TsvCodec.unescape(col("s")).as("r"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(back === Seq(None))
  }

  test("1 MiB string with embedded control chars roundtrips") {
    val big = ("payload\twith\nstuff\\and more " * 40000).take(1 << 20)
    assert(roundtrip(Seq(big)) === Seq(big))
  }

  test("property: unescape(escape(s)) == s and escape output has no raw tab/newline/CR") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf('\t', '\n', '\r', '\b', '\f', '\u000b', '\\', 'N', 'r', 'v', ' ', 'é')))
      .map(_.mkString)
    check(Prop.forAllNoShrink(Gen.listOfN(20, gen)) { ss =>
      roundtrip(ss) == ss && escaped(ss).forall(e =>
        !e.contains('\t') && !e.contains('\n') && !e.contains('\r'))
    }, n = 10)
  }
}
