package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fact-scale quantile bucketing — the at-scale re-expression of a global
  * `ntile(n)` window (WindowQueries notes the single-partition window is
  * only acceptable on dims).
  *
  * Shape: boundaries come from `approx_percentile` (a mergeable sketch —
  * partial-agg, one tiny aggregate row to the driver, same class of
  * driver-side scalar as any `count()`), then bucket assignment is a
  * map-side comparison chain — no window, no shuffle, no global sort.
  * Error is bounded by the sketch `accuracy` (1/accuracy relative rank
  * error), so bucket POPULATIONS are approximately equal rather than
  * exactly equal — the trade every large-scale ntile makes.
  */
object Quantiles {

  /** Bucket boundaries at probabilities 1/n … (n−1)/n. */
  def boundaries(df: DataFrame, value: Column, n: Int,
                 accuracy: Int = 10000): Seq[Double] = {
    val probs = (1 until n).map(_.toDouble / n).toArray
    df.agg(percentile_approx(value.cast("double"),
        lit(probs), lit(accuracy)).as("b"))
      .head().getSeq[Double](0)
  }

  /** Add `bucketCol` ∈ [1, n]: rows ≤ boundary(i) land in bucket i+1,
    * everything above the last boundary in bucket n. Monotone in value.
    */
  def approxNtile(df: DataFrame, value: Column, n: Int,
                  bucketCol: String = "bucket",
                  accuracy: Int = 10000): DataFrame = {
    val bs = boundaries(df, value, n, accuracy)
    val bucket = bs.zipWithIndex.foldRight(lit(n): Column) {
      case ((b, i), acc) => when(value.cast("double") <= b, i + 1).otherwise(acc)
    }
    df.withColumn(bucketCol, bucket.cast("long"))
  }
}
