package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twins vs batch semantics on the FIXTURES.md §3.3 fixture:
  * two users, gaps straddling the 30-min session threshold, one row
  * arriving 61 minutes late (beyond the 1h watermark).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class Doc(ts: Timestamp, doc_id: Long, text: String)

class StreamTwinsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  /** The driver's events.ts arrived as TIMESTAMP(NANOS) in earlier rounds
    * (read as raw nanos Long under the legacy conf, then floored to µs)
    * and as TIMESTAMP(MICROS) since round 9 — normalize either shape,
    * exactly like core.t() does for batch reads.
    */
  private def normalizeTs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      // watermarks demand TIMESTAMP (LTZ); the session runs UTC, so the
      // cast is a pure re-tag of the same micros
      df.withColumn("ts", col("ts").cast("timestamp"))
    else df

  // user 1: events at 0, 29' (same session), 61' (31' gap → new session)
  // user 2: events at 0, 31' (new session), 40' (same session)
  private val fixture = Seq(
    Ev(0, ts(0), 1, "view", 1.0), Ev(1, ts(29), 1, "view", 1.0), Ev(2, ts(61), 1, "view", 1.0),
    Ev(3, ts(0), 2, "click", 1.0), Ev(4, ts(31), 2, "click", 1.0), Ev(5, ts(40), 2, "click", 1.0))

  // arrives AFTER the stream has advanced to minute 200 — 61+ min late.
  private val lateRow = Ev(6, ts(100), 1, "view", 1.0)
  private val sentinel = Ev(7, ts(200), 2, "click", 1.0)

  private def runStream(batches: Seq[Seq[Ev]])(q: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val query = q(mem.toDF()).writeStream
      .format("memory").queryName("twin_out").outputMode("append").start()
    batches.foreach { b => mem.addData(b); query.processAllAvailable() }
    query.stop()
    spark.table("twin_out").collect()
  }

  test("session_window twin matches batch gap arithmetic") {
    val rows = runStream(Seq(fixture, Seq(sentinel)))(
      StreamTwins.sessionCounts(_, gap = "30 minutes", watermark = "1 minute"))
    val sessionsPerUser = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // user 1: [0,29] then [61] → 2 sessions; user 2: [0] then [31,40] → 2
    // (sentinel session for user 2 still open → not emitted in append mode)
    assert(sessionsPerUser === Map(1L -> 2, 2L -> 2))
    // batch twin on the same rows (29' gap joins, 31' gap splits)
    val batch = fixture.toDF()
      .withColumn("epoch_s", unix_timestamp(col("ts")))
      .withColumn("gap_s", col("epoch_s") - lag("epoch_s", 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts", "event_id")))
      .withColumn("flag", when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
      .groupBy("user_id").agg(sum("flag").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch === Map(1L -> 2L, 2L -> 2L))
  }

  test("mapGroupsWithState replacing twin converges to batch applyReplacing FINAL") {
    implicit val sqlCtx = spark.sqlContext
    // golden change feed as JSON lines, split across two micro-batches;
    // key 1 gets updated across the batch boundary, key 2 is deleted.
    val b1 = Seq(
      """{"lsn":1,"op":"I","table":"t","after":{"k":1,"v":"a"}}""",
      """{"lsn":2,"op":"U","table":"t","before":{"k":1,"v":"a"},"after":{"k":1,"v":"b"}}""",
      """{"lsn":3,"op":"I","table":"t","after":{"k":2,"v":"x"}}""")
    val b2 = Seq(
      """{"lsn":4,"op":"U","table":"t","before":{"k":1,"v":"b"},"after":{"k":1,"v":"c"}}""",
      """{"lsn":5,"op":"D","table":"t","before":{"k":2,"v":"x"}}""")
    val mem = MemoryStream[String]
    val updates = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Boolean)]
    val q = StreamTwins.replacingLatestStream(
        ChangeFeed.fromJsonLines(mem.toDF().toDF("value"), ChangeRelation.testRow))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        updates ++= b.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
        ()
      }
      .start()
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()
    // streaming FINAL: per key, the highest-lsn emission, minus tombstones
    val finalState = updates.groupBy(_._1).view
      .mapValues(_.maxBy(_._2)).toMap.values
      .filterNot(_._4).map(u => (u._1, u._3)).toSet
    // batch FINAL over the same five changes
    val allChanges = ChangeFeed.fromJsonLines(
      (b1 ++ b2).toDF("value"), ChangeRelation.testRow)
    val batchState = CdcApply.applyReplacing(allChanges, Seq("k"))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(finalState === batchState)
    assert(finalState === Set((1L, "c")))
    // the cross-batch state actually carried: batch 2's emission for key 1
    // must reflect lsn 4 even though lsn 1-2 arrived in batch 1
    assert(updates.filter(u => u._1 == 1L && u._2 == 4L).nonEmpty)
  }

  test("mapGroupsWithState collapsing twin converges to batch collapse") {
    implicit val sqlCtx = spark.sqlContext
    // insert+delete collapses away; insert+update nets to the new value;
    // the churn for key 1 crosses the micro-batch boundary.
    val b1 = Seq(
      """{"lsn":1,"op":"I","table":"t","after":{"k":1,"v":"a"}}""",
      """{"lsn":2,"op":"I","table":"t","after":{"k":2,"v":"x"}}""")
    val b2 = Seq(
      """{"lsn":3,"op":"U","table":"t","before":{"k":1,"v":"a"},"after":{"k":1,"v":"b"}}""",
      """{"lsn":4,"op":"D","table":"t","before":{"k":2,"v":"x"}}""")
    val mem = MemoryStream[String]
    val nets = scala.collection.mutable.Map.empty[(Long, Option[String]), Int]
    val q = StreamTwins.collapsingNetStream(
        ChangeFeed.fromJsonLines(mem.toDF().toDF("value"), ChangeRelation.testRow))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r =>
          nets((r.getLong(0), Option(r.getString(1)))) = r.getInt(2))
        ()
      }
      .start()
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()
    // streaming survivors: rows whose final net != 0
    val streamed = nets.collect { case ((k, v), net) if net != 0 => (k, v.orNull) }.toSet
    // batch twin over the same four changes
    val allChanges = ChangeFeed.fromJsonLines(
      (b1 ++ b2).toDF("value"), ChangeRelation.testRow)
    val batch = CdcApply.collapse(CdcApply.toSignedRows(allChanges))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
    assert(streamed === Set((1L, "b"))) // 1 netted to v=b; 2 collapsed away
    // the collapsed-away history really netted to zero, not "never seen"
    assert(nets((1L, Some("a"))) === 0)
    assert(nets((2L, Some("x"))) === 0)
  }

  test("file-source streaming twin over the REAL events table matches the batch query") {
    // the reference's steady-state loop over driver testdata: readStream
    // on the events parquet -> event-time tumbling agg, compared against
    // the declared batch query's result on the same rows.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    // the file stream source wants a DIRECTORY it can watch for arrivals
    val dir = java.nio.file.Files.createTempDirectory("graft_events_feed")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = normalizeTs(spark.readStream.schema(schema).parquet(dir.toString))
    val q = StreamTwins.tumblingCounts(stream)
      .writeStream.format("memory").queryName("twin_real")
      .outputMode("complete") // bounded input: emit all windows, final tick
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("twin_real")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.Registry.all.toMap.apply("stream_tumbling_window")
      .fn(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
  }

  test("file-source session-window twin over the REAL events table matches the batch query") {
    // VERDICT r06 #7: the fixture test above pins the gap arithmetic;
    // this replays the driver's real events table through the built-in
    // session_window and asserts the per-user session COUNTS equal the
    // declared batch query's output (complete mode: bounded input, all
    // sessions finalized on the last tick).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_sess")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = normalizeTs(spark.readStream.schema(schema).parquet(dir.toString))
    val q = StreamTwins.sessionCounts(stream)
      .writeStream.format("memory").queryName("sess_real")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_real").groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.Registry.all.toMap.apply("stream_session_window")
      .fn(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
    // and the sessions partition the events: per-session counts sum to
    // the table's row count (every event in exactly one session)
    val totalEvents = spark.table("sess_real")
      .agg(sum(col("events_in_session"))).collect()(0).getLong(0)
    assert(totalEvents === spark.read.parquet(path).count())
  }

  test("file-source stream-stream interval join over the REAL events table matches the batch query") {
    // TRUE watermarked stream-stream join (both sides of the same file
    // stream): purchases pair with the same user's views in the prior 2 h.
    // Append mode — joined pairs are final once the watermark passes, so
    // the emitted set must equal the batch interval join exactly.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_ivj")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = normalizeTs(spark.readStream.schema(schema).parquet(dir.toString))
    val q = StreamTwins.intervalJoinStream(stream)
      .writeStream.format("memory").queryName("ivj_real")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ivj_real")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.Registry.all.toMap.apply("stream_interval_join")
      .fn(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty) // the fixture actually exercises the join
  }

  test("streaming exact dedup: duplicate content drops across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamTwins.dedupStream(mem.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream_out")
      .outputMode("append").start()
    mem.addData(Seq(Doc(ts(0), 0, "alpha text"), Doc(ts(1), 1, "beta text")))
    q.processAllAvailable()
    // batch 2: doc 2 repeats doc 0's CONTENT (different id) inside the
    // horizon → dropped by state carried across the batch boundary
    mem.addData(Seq(Doc(ts(5), 2, "alpha text"), Doc(ts(6), 3, "gamma text")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_stream_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(0L, 1L, 3L), "first copies pass, in-horizon dup drops")
    // and the batch twin agrees on the distinct-content count
    assert(out.size === 3)
  }

  test("watermark drops the 61-minute-late row") {
    val rows = runStream(Seq(fixture, Seq(sentinel), Seq(lateRow), Seq.empty))(
      StreamTwins.tumblingCounts(_, watermark = "1 hour"))
    val total = rows.map(_.getLong(2)).sum
    // fixture's two hour-windows (5 + 1 events) finalize once the sentinel
    // advances the watermark past them; the lateRow's window was already
    // finalized → dropped; the sentinel's own window never finalizes.
    assert(total === 6L)
  }

  test("SCD2 twin: intervals close across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamTwins.scd2HistoryStream(mem.toDF())
      .writeStream.format("memory").queryName("scd2_fix")
      .outputMode("append").start()
    // batch 1: user 1 has two changes (one closed interval emitted),
    // user 2 one change (stays open in state)
    mem.addData(Seq(Ev(10, ts(0), 1, "a", 1.0), Ev(20, ts(1), 1, "b", 2.0),
      Ev(15, ts(0), 2, "x", 5.0)))
    q.processAllAvailable()
    // batch 2: both users change — the OPEN intervals from batch 1 must
    // close with valid_to from the new batch (state carried across)
    mem.addData(Seq(Ev(30, ts(2), 1, "c", 3.0), Ev(25, ts(2), 2, "y", 6.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("scd2_fix").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(rows === Set(
      (1L, 10L, 20L, "a"),   // closed within batch 1
      (1L, 20L, 30L, "b"),   // closed across the boundary
      (2L, 15L, 25L, "x")),  // closed across the boundary
      "closed-interval set must equal the batch lead() semantics")
    // open intervals (1,30,'c') and (2,25,'y') stay in state, unemitted
  }

  test("SCD2 twin over the REAL events table matches the batch query's closed rows") {
    // cdc_scd2_history's streaming form (VERDICT r07 #6): replaying the
    // driver's real events must reproduce every is_current=0 interval of
    // the declared batch query; is_current=1 rows are exactly the ones
    // the stream still holds open in state.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_scd2")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = StreamTwins.scd2HistoryStream(stream)
      .writeStream.format("memory").queryName("scd2_real")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("scd2_real").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getDouble(4))).toMap
    val batchRows = graft.Registry.all.toMap.apply("cdc_scd2_history")
      .fn(spark, sf001).collect()
    val closed = batchRows.filter(_.getLong(5) == 0L)
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getDouble(4))).toMap
    val open = batchRows.filter(_.getLong(5) == 1L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(closed.nonEmpty)
    assert(closed.forall { case (k, v) => streamed.get(k).contains(v) },
      "streaming per-key state diverges from the batch lead() intervals")
    assert(open.forall(!streamed.contains(_)),
      "open (is_current) intervals must stay in state, not in append output")
  }

  test("as-of tolerance twin over the REAL events table matches the batch query") {
    // join_asof_tolerance's streaming form: per-user state is ONE long
    // (the latest view LSN); staleness is checked at emit. Replaying the
    // driver's real events through flatMapGroupsWithState must reproduce
    // the declared batch query's (event_id → last_view) map exactly.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_asof")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = StreamTwins.asofToleranceStream(stream)
      .writeStream.format("memory").queryName("asof_tol_real")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val streamed = toMap(spark.table("asof_tol_real").collect())
    val batch = toMap(graft.Registry.all.toMap.apply("join_asof_tolerance")
      .fn(spark, sf001).collect())
    // the batch query LIMITs to the first 500 purchases; compare on its
    // domain (at sf0.001 the limit does not bind, but stay robust)
    assert(batch.nonEmpty)
    assert(batch.forall { case (id, lv) => streamed.get(id).contains(lv) },
      "streaming as-of with bounded state diverges from the batch RANGE frame")
    assert(streamed.size >= batch.size)
  }

  test("gaps-and-islands twin over the REAL events table emits every closed streak") {
    // win_gaps_islands' streaming form: one (event_type, length) pair of
    // state per user; closed streaks are appended, the live streak stays
    // in state. Replaying the driver's real events must emit exactly the
    // batch islands minus each user's final (still-open) one.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_streak")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = StreamTwins.streakStream(stream)
      .writeStream.format("memory").queryName("streak_real")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("streak_real").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // independent island replication from the raw table (open one dropped)
    val ev = graft.core.t(spark, sf001, "events")
      .select("event_id", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val closed = ev.groupBy(_._2).toSeq.flatMap { case (u, rows) =>
      val islands = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      var cur = ""
      var len = 0L
      rows.sortBy(_._1).foreach { case (_, _, tpe) =>
        if (tpe == cur) len += 1
        else {
          if (len > 0) islands += ((u, cur, len))
          cur = tpe
          len = 1L
        }
      }
      islands
    }
    def ms(xs: Seq[(Long, String, Long)]) =
      xs.groupBy(identity).view.mapValues(_.size).toMap
    assert(closed.nonEmpty)
    assert(ms(streamed) == ms(closed),
      "streamed closed streaks diverge from the replayed islands")
    // anchor against the DECLARED query: every user has exactly one open
    // streak, so closed-per-user must be n_streaks - 1
    val batch = graft.Registry.all.toMap.apply("win_gaps_islands")
      .fn(spark, sf001).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val closedPerUser = closed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(batch.nonEmpty)
    assert(batch.forall { case (u, n) => closedPerUser.getOrElse(u, 0L) == n - 1 },
      "closed streak counts disagree with win_gaps_islands' n_streaks")
  }

  test("summing rollup twin over the REAL events table converges to the batch merge") {
    // cdc_summing_rollup's streaming form: one (cents, count) state per
    // (user_id, event_type); Update mode re-emits a key's merged row each
    // micro-batch, so the LAST emit per key is the final merged table and
    // must equal the declared batch query (exact-cents state makes this
    // bit-stable under any micro-batch slicing).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_sum")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = StreamTwins.summingRollupStream(stream)
      .writeStream.format("memory").queryName("sum_real")
      .outputMode("update")
      .start()
    q.processAllAvailable()
    q.stop()
    // last emit per key wins (memory sink appends each batch's updates)
    val streamed = spark.table("sum_real").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap // later rows overwrite earlier ones per key
    val batch = graft.Registry.all.toMap.apply("cdc_summing_rollup")
      .fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(batch.nonEmpty)
    assert(batch.forall { case (k, v) => streamed.get(k).contains(v) },
      "streaming merged state diverges from the batch SummingMergeTree read")
    // keys the batch filter dropped (all-zero sums) may exist in the
    // stream; every OTHER streamed key must be in the batch result
    assert(streamed.filter(_._2._1 != 0.0).keySet == batch.keySet,
      "streamed non-zero keys diverge from the batch result")
  }

  test("nearest-view twin over the REAL events table matches decided batch rows") {
    // join_asof_nearest's streaming form: a purchase defers its decision
    // until the next view proves which side is closer (unless its
    // backward view is at distance 1 — unbeatable). Replaying the real
    // events: every streamed decision must equal the batch query's
    // near_view, and every batch purchase MISSING from the stream must
    // be one the stream legitimately left pending — i.e. no later view
    // exists for that user.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_nearest")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = StreamTwins.nearestViewStream(stream)
      .writeStream.format("memory").queryName("nearest_real")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val streamed = toMap(spark.table("nearest_real").collect())
    val batch = toMap(graft.Registry.all.toMap.apply("join_asof_nearest")
      .fn(spark, sf001).collect())
    assert(streamed.nonEmpty && batch.nonEmpty)
    assert(streamed.forall { case (id, nv) => batch.get(id).forall(_ == nv) },
      "a streamed nearest decision diverges from the batch query")
    // purchases the stream left pending: only legal when no later view
    val ev = graft.core.t(spark, sf001, "events")
      .select("event_id", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val lastViewByUser = ev.filter(_._3 == "view").groupBy(_._2)
      .view.mapValues(_.map(_._1).max).toMap
    val userOf = ev.map(e => e._1 -> e._2).toMap
    val pendingIds = batch.keySet -- streamed.keySet
    assert(pendingIds.forall { id =>
      lastViewByUser.get(userOf(id)).forall(_ < id)
    }, "stream left a purchase pending although a later view existed")
  }

  test("window-funnel twin over the REAL events table reproduces the batch histogram") {
    // agg_window_funnel's streaming form appends one row per LEVEL
    // INCREASE; each user's max emitted level (0 when nothing emitted)
    // must histogram exactly to the declared batch query's output.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_funnel")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = normalizeTs(spark.readStream.schema(schema).parquet(dir.toString))
    val q = StreamTwins.windowFunnelStream(stream)
      .writeStream.format("memory").queryName("funnel_real")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val maxLevel = spark.table("funnel_real").collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val allUsers = graft.core.t(spark, sf001, "events")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val streamedHist = allUsers.toSeq
      .map(u => maxLevel.getOrElse(u, 0L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val batchHist = graft.Registry.all.toMap.apply("agg_window_funnel")
      .fn(spark, sf001).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batchHist.nonEmpty)
    assert(streamedHist === batchHist,
      "streaming funnel transitions diverge from the batch level histogram")
  }

  test("sequence-match twin over the REAL events table matches the batch counts") {
    // agg_sequence_match's streaming form appends one row per user the
    // first time each pattern (view..purchase any-gap, view->purchase
    // adjacent) completes; distinct users per flag must equal the batch
    // query's matched_any_gap / matched_adjacent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_seq")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = normalizeTs(spark.readStream.schema(schema).parquet(dir.toString))
    val q = StreamTwins.sequenceMatchStream(stream)
      .writeStream.format("memory").queryName("seq_real")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("seq_real").collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    val anyUsers = emitted.filter(_._2 == 1).map(_._1).distinct.length.toLong
    val adjUsers = emitted.filter(_._2 == 2).map(_._1).distinct.length.toLong
    val batch = graft.Registry.all.toMap.apply("agg_sequence_match")
      .fn(spark, sf001).collect().head
    assert(batch.getLong(1) > 0, "fixture must exercise the any-gap pattern")
    assert(anyUsers === batch.getLong(1),
      s"any-gap matches diverge: streamed $anyUsers vs batch ${batch.getLong(1)}")
    assert(adjUsers === batch.getLong(2),
      s"adjacent matches diverge: streamed $adjUsers vs batch ${batch.getLong(2)}")
  }

  test("graphite raw-partial twin over the REAL events table retiers to the batch rollup") {
    // the stream maintains stage-1 raw partials; applying the batch
    // query's stage-2 tiering over the CONVERGED state must reproduce
    // cdc_graphite_rollup exactly (the read-side retier is the
    // GraphiteMergeTree merge-time semantic).
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sf001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_graphite")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events_000.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = normalizeTs(spark.readStream.schema(schema).parquet(dir.toString))
    val q = StreamTwins.graphiteRawStream(stream)
      .writeStream.format("memory").queryName("graphite_raw")
      .outputMode("update")
      .start()
    q.processAllAvailable()
    q.stop()
    // converged state = the last emission per key
    val raw = spark.table("graphite_raw")
      .groupBy("event_type", "day", "h", "sec_id")
      .agg(last(col("pc")).as("pc"), last(col("cents")).as("cents"))
    val maxd = raw.agg(max(col("day")).as("maxd"))
    val streamed = raw.crossJoin(broadcast(maxd))
      .withColumn("tier", when(col("maxd") - col("day") < 1, "raw")
        .when(col("maxd") - col("day") < 7, "hourly").otherwise("daily"))
      .withColumn("bucket", when(col("tier") === "raw", col("sec_id"))
        .when(col("tier") === "hourly", col("day") * 24 + col("h"))
        .otherwise(col("day")))
      .groupBy("event_type", "tier", "bucket")
      .agg(sum(col("pc")).cast("long").as("n"),
        (sum(col("cents")).cast("double") / 100.0).as("value_sum"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    val batch = graft.Registry.all.toMap.apply("cdc_graphite_rollup")
      .fn(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(batch.nonEmpty && batch.keySet.exists(_._2 == "raw"))
    assert(streamed === batch,
      "retiered streaming partials diverge from the batch rollup")
  }

  test("dedup-counts twin over the REAL events table matches the batch deduped column") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val real = graft.core.t(spark, sf001, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().sortBy(_.ts.getTime)
    // replays: duplicate every 5th row (at-least-once redelivery) — the
    // dedup must collapse them; sentinel 4h past the end flushes every
    // real hour through the 2h watermark
    val dups = real.zipWithIndex.collect { case (e, i) if i % 5 == 0 => e }
    val sentinel = Ev(-1L, new Timestamp(real.map(_.ts.getTime).max + 4 * 3600 * 1000L),
      999999L, "view", 0.0)
    val mem = MemoryStream[Ev]
    val q = StreamTwins.dedupCountsStream(mem.toDF()).writeStream
      .format("memory").queryName("dedup_counts").outputMode("append").start()
    mem.addData((real ++ dups).toSeq); q.processAllAvailable()
    mem.addData(Seq(sentinel)); q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_counts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.Registry.all.toMap.apply("stream_dedup_watermark")
      .fn(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(batch.nonEmpty)
    // every real hour was flushed and matches; the sentinel's own hour
    // (still open at stop) must be the only difference
    assert(got.view.filterKeys(batch.contains).toMap === batch)
    assert(batch.keySet.subsetOf(got.keySet),
      s"hours not flushed: ${batch.keySet -- got.keySet}")
  }

  test("hourly-topk twin over the REAL events table: finalized counts + rank match batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val real = graft.core.t(spark, sf001, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().sortBy(_.ts.getTime)
    val sentinel = Ev(-1L, new Timestamp(real.map(_.ts.getTime).max + 4 * 3600 * 1000L),
      999999L, "view", 0.0)
    val mem = MemoryStream[Ev]
    val q = StreamTwins.hourlyTypeCounts(mem.toDF()).writeStream
      .format("memory").queryName("hourly_counts").outputMode("append").start()
    mem.addData(real.toSeq); q.processAllAvailable()
    mem.addData(Seq(sentinel)); q.processAllAvailable()
    q.stop()
    // the production foreachBatch rank: per finalized hour, sort the
    // <=|types| rows, keep 3 — plain Scala over the emitted relation
    val got = spark.table("hourly_counts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (h, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, tp, c), i) => (h, i + 1L, tp, c) }
      }.toSet
    val batch = graft.Registry.all.toMap.apply("stream_hourly_topk")
      .fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(batch.nonEmpty)
    assert(batch.subsetOf(got), s"missing: ${batch -- got}")
    // got may additionally contain the sentinel's own hour only
    val extra = (got -- batch).map(_._1)
    assert(extra.forall(_ == (sentinel.ts.getTime / 1000 / 3600) * 3600),
      s"unexpected extra hours: $extra")
  }

  test("transition-pairs twin over the REAL events table matches the batch matrix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val real = graft.core.t(spark, sf001, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().sortBy(_.ts.getTime)
    // split mid-stream so batch-boundary transitions exercise the state
    val (b1, b2) = real.splitAt(real.length / 2)
    val mem = MemoryStream[Ev]
    val q = StreamTwins.transitionPairsStream(mem.toDF()).writeStream
      .format("memory").queryName("trans_pairs").outputMode("append").start()
    mem.addData(b1.toSeq); q.processAllAvailable()
    mem.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_pairs").collect()
      .map(r => (r.getString(1), r.getString(2)))
      .groupBy(x => x).view.mapValues(_.length.toLong).toMap
    val batch = graft.Registry.all.toMap.apply("agg_transition_matrix")
      .fn(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(batch.nonEmpty)
    assert(got === batch, "streamed transition counts diverge from the batch matrix")
  }
}
