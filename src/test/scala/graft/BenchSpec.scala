package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench must FAIL LOUDLY on a broken query (VERDICT r02 "What's
  * wrong" #3): a swallowed throw scores ~0 s, so a regression that breaks
  * a heavy query would *improve* the bench total. runAll records the error
  * and main exits nonzero.
  */
class BenchSpec extends SparkSpec {

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("n")
  private val broken: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).selectExpr("no_such_function(id)")

  test("a deliberately broken query is recorded as an error, not swallowed") {
    val results = Bench.runAll(spark, sf001, Seq("ok" -> good, "boom" -> broken))
    assert(results.map(_.name) === Seq("ok", "boom"))
    assert(results.find(_.name == "ok").get.err.isEmpty)
    val boom = results.find(_.name == "boom").get
    assert(boom.err.isDefined, "broken query must surface its error")
    assert(boom.err.get.nonEmpty)
  }

  test("errors reach the JSON line and mark the run failed") {
    val results = Bench.runAll(spark, sf001, Seq("ok" -> good, "boom" -> broken))
    val json = Bench.renderJson(results, sf001)
    assert(json.contains("\"errors\":{\"boom\":"))
    assert(results.exists(_.err.isDefined), "main exits nonzero on this condition")
  }

  test("a clean run renders empty errors") {
    val results = Bench.runAll(spark, sf001, Seq("ok" -> good))
    assert(Bench.renderJson(results, sf001).contains("\"errors\":{}"))
    assert(!results.exists(_.err.isDefined))
  }
}
