package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench must FAIL LOUDLY on a broken query (VERDICT r02 "What's
  * wrong" #3): a swallowed throw scores ~0 s, so a regression that breaks
  * a heavy query would *improve* the bench total. runAll records the error
  * and main exits nonzero.
  *
  * Contention hardening (VERDICT r07 #1): the second measurement of each
  * query is interleaved (all queries once, then all again) so one
  * sustained load spike can't cover both runs of a query; a fixed canary
  * probe is recorded through the sweep; and a >3x disagreement between a
  * query's two runs triggers a third.
  */
class BenchSpec extends SparkSpec {

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("n")
  private val broken: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).selectExpr("no_such_function(id)")

  test("a deliberately broken query is recorded as an error, not swallowed") {
    val results = Bench.runAll(spark, sf001, Seq("ok" -> good, "boom" -> broken)).results
    assert(results.map(_.name) === Seq("ok", "boom"))
    assert(results.find(_.name == "ok").get.err.isEmpty)
    val boom = results.find(_.name == "boom").get
    assert(boom.err.isDefined, "broken query must surface its error")
    assert(boom.err.get.nonEmpty)
  }

  test("errors reach the JSON line and mark the run failed") {
    val sweep = Bench.runAll(spark, sf001, Seq("ok" -> good, "boom" -> broken))
    val json = Bench.renderJson(sweep, sf001)
    assert(json.contains("\"errors\":{\"boom\":"))
    assert(sweep.results.exists(_.err.isDefined), "main exits nonzero on this condition")
  }

  test("a clean run renders empty errors") {
    val sweep = Bench.runAll(spark, sf001, Seq("ok" -> good))
    assert(Bench.renderJson(sweep, sf001).contains("\"errors\":{}"))
    assert(!sweep.results.exists(_.err.isDefined))
  }

  test("passes are interleaved: warmup, then two full measured passes in order") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    def tracked(name: String): (SparkSession, String) => DataFrame =
      (s, _) => { order.synchronized { order += name }; s.range(5).toDF("n") }
    val qs = Seq("a", "b", "c").map(n => n -> tracked(n))
    Bench.runAll(spark, sf001, qs)
    // warmup pass + two measured passes, each covering every query before
    // the next begins — never a,a,a,b,b,b
    assert(order.toSeq === Seq("a", "b", "c", "a", "b", "c", "a", "b", "c"),
      s"expected three interleaved passes; got $order")
  }

  test("canary series is recorded, chronological, and positive") {
    val sweep = Bench.runAll(spark, sf001, Seq("ok" -> good), canaryEvery = 1)
    // 1 before the only query in each pass + 1 at the end of each pass
    assert(sweep.canary.size >= 3)
    assert(sweep.canary.forall(_ > 0))
    val json = Bench.renderJson(sweep, sf001)
    assert(json.contains("\"canary\":["))
    assert(json.contains("\"canary_every\":1"))
  }

  test(">3x disagreement between the two measured runs triggers a third measurement") {
    // call 1 is the unmeasured warmup; call 2 (measured pass 1) sleeps —
    // an artificial 'spike' covering one measured run only
    var calls = 0
    val spiky: (SparkSession, String) => DataFrame = (s, _) => {
      calls += 1
      if (calls == 2) Thread.sleep(1200)
      s.range(5).toDF("n")
    }
    val r = Bench.runAll(spark, sf001, Seq("spiky" -> spiky)).results.head
    assert(r.runs.size === 3, s"expected a third run after >3x disagreement; got ${r.runs}")
    assert(r.sec === r.runs.min)
    assert(calls === 4, "warmup + two measured + one tiebreak")
  }

  test("steady queries keep exactly two runs") {
    val r = Bench.runAll(spark, sf001, Seq("ok" -> good)).results.head
    assert(r.runs.size === 2, s"no disagreement -> no third run; got ${r.runs}")
  }
}
