package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** approxNtile must bucket monotonically and near-evenly, agreeing with
  * exact ntile for all but boundary-adjacent rows.
  */
class QuantilesSpec extends SparkSpec {

  test("approxNtile(4) over customer acctbal ~ exact ntile(4)") {
    val customer = graft.core.t(spark, sf001, "customer")
    val n = customer.count()
    val approx = Quantiles.approxNtile(customer, col("c_acctbal"), 4)
      .select(col("c_custkey"), col("bucket"))
    val sizes = approx.groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === Set(1L, 2L, 3L, 4L))
    // near-even: every bucket within 15% of the ideal quarter
    sizes.values.foreach(s =>
      assert(math.abs(s - n / 4.0) < n * 0.15, s"skewed bucket: $sizes"))
    // agreement with the exact window for the overwhelming majority
    val exact = customer.select(col("c_custkey"),
      ntile(4).over(Window.orderBy(col("c_acctbal"), col("c_custkey")))
        .cast("long").as("xbucket"))
    val disagree = approx.join(exact, "c_custkey")
      .filter(col("bucket") =!= col("xbucket")).count()
    assert(disagree < n * 0.05, s"$disagree of $n rows disagree with exact ntile")
    // monotone: max value in bucket i <= min value in bucket i+1
    val byBucket = Quantiles.approxNtile(customer, col("c_acctbal"), 4)
      .groupBy("bucket")
      .agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
      .orderBy("bucket").collect()
    byBucket.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(2) <= b.getDouble(1) + 1e-9)
      case _ =>
    }
  }
}
