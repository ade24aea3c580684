package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — co-located joins without a shuffle.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is shuffling both
  * sides on the key. Writing both tables bucketed (and sorted) by the
  * join key with the SAME bucket count lets Spark plan a SortMergeJoin
  * with ZERO Exchange: every bucket pair joins locally. This is the
  * Spark-native analog of the reference keeping each table's rows keyed
  * and ordered in its own MergeTree (SURVEY.md §2.A11 `ORDER BY row_id`
  * merge) — pre-organize once, never re-shuffle per query.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucket-count tables on their bucket key. With equal
    * bucketing on both sides the physical plan is exchange-free (assert
    * with [[isShuffleFree]]).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String,
                    joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey), joinType)

  /** True iff the executed plan contains no shuffle Exchange. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
