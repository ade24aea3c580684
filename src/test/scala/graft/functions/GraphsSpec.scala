package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected components for cluster-correct dedup (VERDICT r03 item 6). */
class GraphsSpec extends SparkSpec {

  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graphs.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to one component with the min id as label") {
    // A~B, B~C but NOT A~C — the non-transitivity case pairwise dedup
    // gets wrong: the cluster is {1,2,3}, keep exactly one (the min)
    val c = comps(Seq((1L, 2L), (2L, 3L)))
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("distinct clusters stay distinct; direction and duplicates are irrelevant") {
    val c = comps(Seq((5L, 4L), (4L, 5L), (5L, 4L), (10L, 11L), (12L, 11L)))
    assert(c === Map(4L -> 4L, 5L -> 4L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("a long path converges within the iteration bound") {
    // path 0-1-2-…-15: diameter 15, worst case for label propagation
    val path = (0L until 15L).map(i => (i, i + 1))
    val c = comps(path)
    assert(c.values.toSet === Set(0L), "every node must reach label 0")
    assert(c.size === 16)
  }

  test("random 5000-edge graph matches a union-find reference exactly") {
    // deterministic pseudo-random graph: 2000 nodes, 5000 edges drawn
    // from a fixed LCG — mixed component sizes, cycles, chains
    var seed = 0x9e3779b97f4a7c15L
    def next(bound: Int): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 17, bound.toLong)
    }
    val edges = Seq.fill(5000)((next(2000), next(2000))).filter(e => e._1 != e._2)

    // reference: classic union-find with path compression (test-side)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id per component: re-root every node, then group by root min
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    val expected = byRoot.values.flatMap { ns =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap

    val got = comps(edges)
    assert(got === expected, "distributed CC must agree with union-find on every node")
    info(s"${nodes.size} nodes, ${edges.size} edges, ${byRoot.size} components")
  }

  test("cluster-keep differs from pairwise-greedy where the graph is a star at the max id") {
    // edges (2,3) and (1,3): greedy drop-the-higher-of-each-pair keeps
    // {1, 2}; cluster semantics keeps only the component min {1}
    val c = comps(Seq((2L, 3L), (1L, 3L)))
    val kept = c.collect { case (id, comp) if id == comp => id }.toSet
    assert(kept === Set(1L))
  }
}
