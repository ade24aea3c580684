package graft

import org.apache.spark.sql.functions._

/** Brute-force / algebraic laws for the round-10 fourth and fifth operator
  * waves (the cross-engine value check is the driver's DuckDB gate; these
  * pin semantics with INDEPENDENT derivations).
  */
class Round10OpsSpec2 extends SparkSpec {

  private def q(name: String) = Registry.all.toMap.apply(name).fn(spark, sf001)

  test("scan_zorder_layout: granule spans cover their rows and stay sub-domain") {
    val rows = q("scan_zorder_layout").collect()
    assert(rows.map(_.getLong(1)).sum ==
      spark.read.parquet(s"$sf001/events.parquet").count(),
      "granules must partition the table")
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2) && r.getLong(5) >= r.getLong(4))
      // the z-order locality claim: granule = z >> 12 fixes the top two
      // bits of BOTH dimensions, so each dimension is confined to one
      // 64-wide quarter — span <= 63 exactly
      assert(r.getLong(6) <= 63 && r.getLong(7) <= 63,
        s"spans ${r.getLong(6)}/${r.getLong(7)} escape the z-quarter")
    }
  }

  test("graph_community_lpa round-1 law: label = most frequent of self+neighbors") {
    // independent 1-round LPA on the same sampled edge set, in Scala
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def keep(x: Long, y: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$x:$y".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 8 == 0
    }
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length if keep(ps(i), ps(j)))
        yield (ps(i), ps(j))
    }.toSet
    val adj = (edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def round(l: Map[Long, Long]): Map[Long, Long] = l.map { case (n, lab) =>
      val votes = (adj.getOrElse(n, Seq()).map(l) :+ lab)
        .groupBy(identity).map { case (k, v) => (k, v.size) }
      n -> votes.toSeq.sortBy(v => (-v._2, v._1)).head._1
    }
    val l2 = round(round(adj.keys.map(n => n -> n).toMap))
    val expected = l2.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .toSeq.sortBy(v => (-v._2, v._1)).take(20).toSet
    val got = q("graph_community_lpa").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got === expected)
  }

  test("sample_domain_reweight: weighted corpus mass is uniform, ESS <= N") {
    val rows = q("sample_domain_reweight").collect()
    val n = rows.map(_.getLong(1)).sum.toDouble
    rows.foreach { r =>
      // n_l * w_l = N / L for every domain — the definition of the mix
      assert(math.abs(r.getLong(1) * r.getDouble(2) - n / rows.length) < n * 1e-4)
      assert(r.getDouble(3) <= n + 1e-6, "ESS cannot exceed the corpus size")
      assert(r.getDouble(3) > 0)
    }
  }

  test("agg_transition_matrix: probabilities normalize per source state") {
    val rows = q("agg_transition_matrix").collect()
    rows.groupBy(_.getString(0)).foreach { case (from, g) =>
      val p = g.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-3, s"$from row sums to $p")
    }
    // pair counts match a direct sequential recount
    val ev = core.t(spark, sf001, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).values.toSeq.flatMap { g =>
      val s = g.sortBy(e => (e._3, e._4)).map(_._2).toSeq
      s.zip(s.drop(1))
    }.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    assert(rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      === expected)
  }

  test("agg_time_to_convert: brute-force funnel agrees") {
    val ev = core.t(spark, sf001, "events")
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val lats = byUser.toSeq.flatMap { case (_, g) =>
      val views = g.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val v = views.min
        val ps = g.filter(e => e._2 == "purchase" && e._3 >= v).map(_._3)
        Some(if (ps.isEmpty) None else Some(ps.min - v))
      }
    }
    val r = q("agg_time_to_convert").collect().head
    assert(r.getLong(0) == lats.size, "viewers")
    assert(r.getLong(1) == lats.count(_.isDefined), "converted")
    assert(r.getLong(4) == lats.flatten.max, "max latency")
  }

  test("cdc_compaction_plan: groups are contiguous and rows are conserved") {
    val rows = q("cdc_compaction_plan").collect()
    val total = rows.map(_.getLong(5)).sum
    assert(total == spark.read.parquet(s"$sf001/events.parquet").count())
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getLong(1))
      // group ids are dense from 0 and day ranges never overlap
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) <= b.getLong(2),
          "merge groups must not overlap in day ranges")
        case _ =>
      }
      // every group except possibly the last is at least half the target
      sorted.dropRight(1).foreach(r =>
        assert(r.getLong(5) >= 1, "empty merge group"))
    }
  }

  test("dedup_lsh_tuning: the b4r2 leg equals dedup_minhash_lsh's candidate count") {
    val tuned = q("dedup_lsh_tuning").collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val prod = q("dedup_minhash_lsh").collect().head.getLong(0)
    assert(tuned("b4r2") == prod,
      s"tuning table b4r2 ${tuned("b4r2")} != production pipeline $prod")
    // recall-leaning config must produce at least as many candidates
    assert(tuned("b8r1") >= tuned("b4r2"))
    assert(tuned("b4r2") >= tuned("b2r4"))
  }

  test("text_boilerplate_strip: brute-force frequency threshold agrees") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def segs(text: String): Seq[String] = {
      val w = text.split(" ", -1)
      (0 until math.ceil(w.length / 10.0).toInt)
        .map(i => w.slice(i * 10, i * 10 + 10).mkString(" "))
    }
    val inst = docs.flatMap { case (id, src, tx) => segs(tx).map(s => (src, s, id)) }
    val bp = inst.map(i => (i._1, i._2, i._3)).distinct
      .groupBy(i => (i._1, i._2)).filter(_._2.map(_._3).distinct.length >= 3).keySet
    val expected = inst.filter(i => bp((i._1, i._2)))
      .groupBy(_._1).map { case (s, v) => s -> v.length.toLong }
    val got = q("text_boilerplate_strip").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
      .filter(_._2 > 0)
    assert(got === expected.filter(_._2 > 0))
  }
}
