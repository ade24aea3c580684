package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupArrayN

/** Direct contract tests for the bounded groupArray(N) aggregate: the
  * buffer can NEVER exceed N entries (the whole point vs collect_list),
  * merge order cannot change the result, and serialization round-trips.
  */
class GroupArrayNSpec extends AnyFunSuite {

  private val agg = GroupArrayN(
    BoundReference(0, LongType, nullable = true),
    BoundReference(1, LongType, nullable = true),
    BoundReference(2, StringType, nullable = true),
    Literal(3))

  private def row(o1: Long, o2: Long, p: String): InternalRow =
    InternalRow(o1, o2, UTF8String.fromString(p))

  private type Buf = scala.collection.mutable.PriorityQueue[(Long, Long, String)]

  private def evalStrings(buf: Buf): Seq[String] = {
    val arr = agg.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("buffer never exceeds N during update, keeps the N smallest") {
    val buf = agg.createAggregationBuffer()
    // 100 entries in DESCENDING order — the adversarial arrival for a cap
    (100L to 1L by -1L).foreach(i => agg.update(buf, row(i, i, s"p$i")))
    assert(buf.size === 3, "buffer exceeded the cap")
    assert(evalStrings(buf) === Seq("p1", "p2", "p3"))
  }

  test("merge caps and is order-independent") {
    val a = agg.createAggregationBuffer()
    val b = agg.createAggregationBuffer()
    Seq(5L, 1L, 9L).foreach(i => agg.update(a, row(i, i, s"p$i")))
    Seq(2L, 8L, 3L).foreach(i => agg.update(b, row(i, i, s"p$i")))
    val ab = agg.merge(agg.deserialize(agg.serialize(a)), b)
    val a2 = agg.createAggregationBuffer()
    val b2 = agg.createAggregationBuffer()
    Seq(5L, 1L, 9L).foreach(i => agg.update(a2, row(i, i, s"p$i")))
    Seq(2L, 8L, 3L).foreach(i => agg.update(b2, row(i, i, s"p$i")))
    val ba = agg.merge(b2, a2)
    assert(ab.size === 3 && ba.size === 3)
    assert(evalStrings(ab) === Seq("p1", "p2", "p3"))
    assert(evalStrings(ab) === evalStrings(ba))
  }

  test("null order keys and payloads are skipped like collect_list") {
    val buf = agg.createAggregationBuffer()
    agg.update(buf, InternalRow(null, 1L, UTF8String.fromString("x")))
    agg.update(buf, InternalRow(1L, 1L, null))
    agg.update(buf, row(2L, 2L, "kept"))
    assert(evalStrings(buf) === Seq("kept"))
  }
}
