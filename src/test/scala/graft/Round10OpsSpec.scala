package graft

import org.apache.spark.sql.functions._

/** Brute-force / law checks for the round-10 second-wave operators.
  * Each check derives the expected answer INDEPENDENTLY (collected rows
  * + plain Scala, or an algebraic law), not by re-running the query's own
  * plan — the cross-engine value check is the driver's DuckDB gate; these
  * pin the semantics.
  */
class Round10OpsSpec extends SparkSpec {

  private def q(name: String) = Registry.all.toMap.apply(name).fn(spark, sf001)

  private lazy val events: Array[(Long, Long, String, Double, Long)] =
    core.t(spark, sf001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_timestamp(col("ts")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))

  test("agg_argminmax: companions sit at the true extremes, min-id tie-break") {
    val rows = q("agg_argminmax").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = events.filter(_._3 == r.getString(0))
      val mn = g.map(_._4).min
      val mx = g.map(_._4).max
      assert(r.getDouble(1) == mn && r.getDouble(3) == mx)
      assert(r.getLong(2) == g.filter(_._4 == mn).map(_._2).min)
      assert(r.getLong(4) == g.filter(_._4 == mx).map(_._2).min)
    }
  }

  test("agg_linreg: closed-form slope/intercept match a direct least-squares fit") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    q("agg_linreg").collect().foreach { r =>
      val g = li.filter(_._1 == r.getString(0))
      val n = g.length.toDouble
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxx = g.map(v => v._2 * v._2).sum; val sxy = g.map(v => v._2 * v._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy * sxx - sx * sxy) / (n * sxx - sx * sx)
      assert(math.abs(r.getDouble(2) - slope) < 1e-3, s"slope ${r.getDouble(2)} vs $slope")
      assert(math.abs(r.getDouble(3) - icept) < 1e-1, s"intercept ${r.getDouble(3)} vs $icept")
    }
  }

  test("agg_skew_kurt: moments match a direct two-pass central-moment computation") {
    q("agg_skew_kurt").collect().foreach { r =>
      val vs = events.filter(_._3 == r.getString(0)).map(_._4)
      val n = vs.length.toDouble
      val mean = vs.sum / n
      def cm(k: Int) = vs.map(v => math.pow(v - mean, k)).sum / n
      val skew = cm(3) / math.pow(cm(2), 1.5)
      val kurt = cm(4) / (cm(2) * cm(2)) - 3.0
      assert(math.abs(r.getDouble(2) - mean) < 1e-2)
      assert(math.abs(r.getDouble(3) - skew) < 1e-3, s"skew ${r.getDouble(3)} vs $skew")
      assert(math.abs(r.getDouble(4) - kurt) < 1e-3, s"kurt ${r.getDouble(4)} vs $kurt")
    }
  }

  test("agg_max_intersections: peak equals max coverage over interval starts") {
    // independent derivation: with half-open intervals the peak live count
    // per user equals max over STARTS t of |{j : s_j <= t < e_j}|
    val byUser = events.groupBy(_._2)
    val expected = byUser.map { case (u, g) =>
      val iv = g.map(e => (e._5, e._5 + 30 + e._1 % 120))
      u -> iv.map(t => iv.count(j => j._1 <= t._1 && t._1 < j._2)).max.toLong
    }
    val hist = expected.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = q("agg_max_intersections").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === hist)
  }

  test("join_interval_overlap: bucketed equi-join equals the brute-force theta join") {
    val views = events.filter(_._3 == "view").map(e => (e._2, e._1, e._5, e._5 + 900))
    val buys = events.filter(_._3 == "purchase").map(e => (e._2, e._1, e._5, e._5 + 900))
    val expected = views.flatMap { a =>
      buys.filter(b => b._1 == a._1 && a._3 < b._4 && b._3 < a._4).map(_ => a._1)
    }.groupBy(identity).map { case (u, v) => u -> v.length.toLong }
    val got = q("join_interval_overlap").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("sim_knn_classify: predictions match a brute-force 5-NN majority vote") {
    val embs = spark.read.parquet(s"$sf001/embeddings.parquet").collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2).toLong)
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val corpus = embs.filter(_._1 >= 20)
    val rows = q("sim_knn_classify").collect()
    assert(rows.length == embs.count(_._1 < 20))
    rows.foreach { r =>
      val probe = embs.find(_._1 == r.getLong(0)).get
      val pn = math.sqrt(dot(probe._2, probe._2))
      val top5 = corpus
        .map(c => (c._1, c._3, pr6(dot(probe._2, c._2) / (pn * math.sqrt(dot(c._2, c._2))))))
        .sortBy(c => (-c._3, c._1)).take(5)
      val votes = top5.groupBy(_._2).map { case (l, v) => (l, v.length) }
      val pred = votes.toSeq.sortBy(v => (-v._2, v._1)).head._1
      assert(r.getLong(1) == probe._3, "true_label mismatch")
      assert(r.getLong(2) == pred, s"probe ${r.getLong(0)}: pred ${r.getLong(2)} vs $pred")
      assert(r.getLong(3) == (if (pred == probe._3) 1L else 0L))
    }
  }

  test("cdc_minmax_prune: pruning is sound (no matching row in a skipped granule)") {
    val rows = q("cdc_minmax_prune").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = events.filter(_._3 == r.getString(0))
      val matched = g.count(_._4 >= 300.0).toLong
      assert(r.getLong(4) == matched, "rows_matched must equal the exact filter count")
      assert(r.getLong(4) <= r.getLong(3), "matches only inside scanned granules")
      assert(r.getLong(2) <= r.getLong(1), "scanned granules <= total granules")
      assert(r.getLong(3) <= g.length, "scanned rows <= table rows")
    }
  }

  test("sample_hash_split: splits partition the corpus, ratios near 80/10/10") {
    val rows = q("sample_hash_split").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = rows.map(_._3).sum
    val docs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(total == docs, "splits must cover every document exactly once")
    val train = rows.filter(_._1 == "train").map(_._3).sum.toDouble / total
    assert(train > 0.7 && train < 0.9, s"train share $train out of band")
  }

  test("agg_bitmap_ops: pair overlaps match brute-force user-set algebra") {
    val sets = events.groupBy(_._3).view.mapValues(_.map(_._2).toSet).toMap
    val rows = q("agg_bitmap_ops").collect()
    val types = sets.keys.toSeq.sorted
    assert(rows.length == types.combinations(2).size)
    rows.foreach { r =>
      val sa = sets(r.getAs[String]("type_a")); val sb = sets(r.getAs[String]("type_b"))
      assert(r.getAs[Long]("n_a") == sa.size && r.getAs[Long]("n_b") == sb.size)
      assert(r.getAs[Long]("n_and") == (sa & sb).size)
      assert(r.getAs[Long]("n_or") == (sa | sb).size)
      val j = (sa & sb).size.toDouble / (sa | sb).size
      assert(math.abs(r.getAs[Double]("jaccard") - j) < 1e-5)
    }
  }

  test("stream_hourly_topk: per-hour ranks match brute-force counts") {
    val counts = events.groupBy(e => ((e._5 / 3600) * 3600, e._3))
      .view.mapValues(_.length.toLong).toMap
    q("stream_hourly_topk").collect().foreach { r =>
      val h = r.getLong(0)
      val top = counts.collect { case ((hh, tp), c) if hh == h => (tp, c) }
        .toSeq.sortBy(v => (-v._2, v._1))
      val (tp, c) = top(r.getLong(1).toInt - 1)
      assert(r.getString(2) == tp && r.getLong(3) == c)
    }
  }

  test("stream_dedup_watermark: deduped <= raw per hour; totals match distinct") {
    val rows = q("stream_dedup_watermark").collect()
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val expectDistinct = events.map(e => ((e._5 / 3600) * 3600, e._2, e._3)).distinct.length
    assert(rows.map(_.getLong(2)).sum == expectDistinct.toLong)
  }
}
