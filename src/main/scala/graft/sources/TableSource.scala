package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-source abstraction — the A1 "initial sync" stage behind one
  * interface (SURVEY.md §2.A1, §3.1).
  *
  * pg2ch's snapshot is `COPY (SELECT cols FROM t) TO STDOUT` inside the
  * replication slot's exported snapshot (`pkg/replicator` sync logic
  * [recall:med]); the driver's stated Spark approach is "Structured
  * Streaming + JDBC source + custom sink". The declared queries read
  * parquet ([[ParquetSource]] wraps `graft.core.t`); [[JdbcSource]] is the
  * same contract against a live database — compiled and option-plumbed
  * here, not connectable in this environment (no database, zero egress).
  */
trait TableSource {
  def table(spark: SparkSession, name: String): DataFrame
}

/** Parquet snapshot directory (`<dir>/<table>.parquet`) — the testdata
  * path every declared query uses.
  */
final case class ParquetSource(dir: String) extends TableSource {
  override def table(spark: SparkSession, name: String): DataFrame =
    graft.core.t(spark, dir, name)
}

/** JDBC snapshot scan with partitioned parallel read — Spark's native
  * equivalent of the reference's consistent COPY snapshot.
  *
  * At 100 TB the single-connection read is the bottleneck, so the adapter
  * exposes Spark's range-partitioned scan: `partitionColumn` + bounds
  * split the snapshot into `numPartitions` concurrent range queries, one
  * per executor task — the distributed form of pg2ch's one-shot COPY.
  * `fetchsize` keeps per-row memory bounded exactly like the reference's
  * row-at-a-time COPY parse.
  */
final case class JdbcSource(
    url: String,
    user: String = "",
    password: String = "",
    fetchSize: Int = 10000,
    partitionColumn: Option[String] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None,
    numPartitions: Int = 1) extends TableSource {

  /** The exact option map handed to the JDBC relation — unit-testable
    * without a live database (`.load()` is what first connects).
    */
  def options(name: String): Map[String, String] = {
    val base = Map(
      "url" -> url,
      "dbtable" -> name,
      "user" -> user,
      "password" -> password,
      "fetchsize" -> fetchSize.toString)
    val parts = (partitionColumn, lowerBound, upperBound) match {
      case (Some(c), Some(lo), Some(hi)) => Map(
        "partitionColumn" -> c,
        "lowerBound" -> lo.toString,
        "upperBound" -> hi.toString,
        "numPartitions" -> numPartitions.toString)
      case _ => Map.empty[String, String]
    }
    base ++ parts
  }

  override def table(spark: SparkSession, name: String): DataFrame =
    spark.read.format("jdbc").options(options(name)).load()
}
