package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities — the explicit form of "salting for skew"
  * for when AQE's skew-join split isn't available (non-shuffle plans,
  * pinned partitioning) or a hot key is known up front.
  *
  * Shape at scale: a hot key (one user, one null-bucket, one default
  * value) funnels its entire shuffle partition to a single task; salting
  * splits the hot key's rows across `salts` sub-partitions by widening
  * the join key to (key, salt) — the big side takes a DETERMINISTIC
  * content-hash salt (never `rand()`: retried tasks must re-produce the
  * same salt or shuffle retries duplicate/lose rows), the small side is
  * replicated `salts` times via one explode (a Generator, no shuffle).
  */
object Skew {

  /** Deterministic salt in [0, salts): content hash of `cols` (all the
    * row's non-key columns ideally — duplicates of the hot key spread as
    * widely as their payloads differ).
    */
  def salt(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")

  /** Salted equi-join: `big ⋈ small ON big(key) = small(key)` with the
    * hot-key shuffle split `salts` ways. Result columns = big.* ++
    * small.* minus the duplicate key (same as a plain `join(small, key)`).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    // right/full outer are structurally wrong under salting: the small
    // side is replicated `salts`×, so its unmatched rows would surface
    // once per salt. Every left-shaped join is safe (each big row carries
    // exactly one salt and every salt replica of a small key exists).
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support $joinType (small side is replicated)")
    val saltCols = big.columns.filter(_ != key).map(col _)
    val b = big.withColumn("__salt", salt(salts, saltCols.toSeq: _*))
    val s = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
