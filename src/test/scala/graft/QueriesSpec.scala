package graft

import org.apache.spark.sql.functions._

/** Every declared query runs on sf0.001, returns a stable schema, and the
  * result is non-empty for all queries whose predicate domain is non-empty
  * at this sf (SURVEY.md §5.2(2)). The cross-engine value check is the
  * driver's DuckDB gate (dev/check.py mimics it).
  */
class QueriesSpec extends SparkSpec {

  // empty-at-sf0.001 is legitimate only for these (threshold predicates)
  private val mayBeEmpty = Set("dedup_embedding_cosine")

  Registry.all.foreach { case (name, d) =>
    test(s"$name runs, schema stable, rows>0") {
      val df = d.fn(spark, sf001)
      val rows = df.count()
      if (!mayBeEmpty(name)) assert(rows > 0, s"$name returned 0 rows at sf0.001")
      // schema sanity: no raw decimal outputs (hash-unstable across engines)
      val decimals = df.schema.fields.filter(_.dataType.typeName.startsWith("decimal"))
      assert(decimals.isEmpty, s"raw DECIMAL in output: ${decimals.map(_.name).mkString(",")}")
    }
  }

  test("entry (t1 smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; approx_distinct_hll is the only omission") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert((q -- o) === Set("approx_distinct_hll"))
  }
}
