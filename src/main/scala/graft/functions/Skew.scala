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
    // a key-only big side has nothing to salt on: xxhash64() with zero
    // args fails analysis, and any constant salt would leave the hot key
    // unsplit anyway. Fail loudly; callers with key-only relations should
    // dedupe (the join is then key∈small membership) or add a payload.
    // Note also: hot-key rows with IDENTICAL payloads all hash to the same
    // salt — content salting spreads a hot key only as widely as its
    // payloads differ (exact duplicate rows stay together by design: a
    // deterministic salt must map equal rows equally under task retry).
    require(big.columns.exists(_ != key),
      s"saltedJoin needs at least one non-key column on the big side to derive " +
        s"a deterministic salt (got only '$key'); dedupe or add a payload column")
    val saltCols = big.columns.filter(_ != key).map(col _)
    val b = big.withColumn("__salt", salt(salts, saltCols.toSeq: _*))
    val s = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
