package graft.sources

import graft.SparkSpec

/** TableSource: the parquet impl must serve the same rows as core.t (the
  * declared-query path), and the JDBC impl's option plumbing must carry
  * the partitioned-scan settings verbatim (no live DB in this env —
  * `.load()` is the first thing that connects, so options() is the
  * testable surface).
  */
class TableSourceSpec extends SparkSpec {

  test("ParquetSource serves the same rows as the core.t query path") {
    val src: TableSource = ParquetSource(sf001)
    assert(src.table(spark, "region").count() ===
      graft.core.t(spark, sf001, "region").count())
    assert(src.table(spark, "events").schema.fieldNames.contains("ts"))
  }

  test("JdbcSource plumbs url/dbtable/credentials/fetchsize") {
    val src = JdbcSource("jdbc:postgresql://db:5432/app", "u", "secret", fetchSize = 500)
    val o = src.options("public.orders")
    assert(o("url") === "jdbc:postgresql://db:5432/app")
    assert(o("dbtable") === "public.orders")
    assert(o("user") === "u" && o("password") === "secret")
    assert(o("fetchsize") === "500")
    assert(!o.contains("partitionColumn"))
  }

  test("JdbcSource plumbs the range-partitioned parallel scan") {
    val src = JdbcSource("jdbc:postgresql://db/app",
      partitionColumn = Some("o_orderkey"),
      lowerBound = Some(1L), upperBound = Some(6000000L), numPartitions = 32)
    val o = src.options("orders")
    assert(o("partitionColumn") === "o_orderkey")
    assert(o("lowerBound") === "1" && o("upperBound") === "6000000")
    assert(o("numPartitions") === "32")
  }

  test("partial partition spec degrades to a single-connection scan") {
    val src = JdbcSource("jdbc:x", partitionColumn = Some("k")) // no bounds
    assert(!src.options("t").contains("numPartitions"))
  }
}
