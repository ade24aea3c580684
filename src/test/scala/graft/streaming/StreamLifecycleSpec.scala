package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's full lifecycle (SURVEY.md §3.2–§3.3) composed as ONE
  * pipeline instead of piecewise units: a file-source WAL feed (JSON
  * lines) → ChangeFeed decode → BufferedSink two-phase commit, with a
  * checkpointed stop/restart in the middle — the restart must resume from
  * the checkpoint (no reprocessing: exactly-once per change row), and the
  * read side must see the correct final table state including a truncate.
  */
class StreamLifecycleSpec extends SparkSpec {

  private def jline(lsn: Long, op: String, k: Long, v: String): String = {
    val after =
      if (op == "I" || op == "U") s""","after":{"k":$k,"v":"$v"}""" else ""
    val before =
      if (op == "U" || op == "D") s""","before":{"k":$k,"v":"old"}""" else ""
    s"""{"lsn":$lsn,"op":"$op","table":"t"$before$after}"""
  }

  private def writeFeed(dir: Path, name: String, lines: Seq[String]): Unit = {
    val tmp = dir.resolve(s".$name.tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, dir.resolve(name)) // atomic: file source never sees partials
  }

  private def runOnePass(in: String, ckpt: String, sink: BufferedSink): Unit = {
    val raw = spark.readStream.text(in)
    val changes = ChangeFeed.fromJsonLines(raw, ChangeRelation.testRow)
    val q = changes.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(sink.forEachBatch _)
      .start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
  }

  private def committedChanges(out: String): DataFrame =
    spark.read.parquet(s"$out/batch=*")

  test("WAL feed -> decode -> sink with checkpointed restart is exactly-once") {
    val in = Files.createTempDirectory("graft_wal_in")
    val out = Files.createTempDirectory("graft_wal_out").toString
    val ckpt = Files.createTempDirectory("graft_wal_ckpt").toString
    val sink = new BufferedSink(out)

    // pass 1: initial history for keys 1 and 2
    writeFeed(in, "wal_000.json", Seq(
      jline(1, "I", 1, "a"), jline(2, "U", 1, "b"),
      jline(3, "I", 2, "x"), jline(4, "D", 2, "")))
    runOnePass(in.toString, ckpt, sink)

    // pass 2 (restart from checkpoint): truncate, then fresh inserts
    writeFeed(in, "wal_001.json", Seq(
      jline(5, "T", 0, ""), jline(6, "I", 3, "z"), jline(7, "U", 3, "zz")))
    runOnePass(in.toString, ckpt, sink)

    // pass 3 (restart with NO new data): must commit nothing new
    val batchesBefore = sink.committedBatches()
    runOnePass(in.toString, ckpt, sink)
    assert(sink.committedBatches() === batchesBefore)

    // exactly-once: every change row (incl. the decoded truncate at lsn 5)
    // landed exactly once across all committed batches
    val lsns = committedChanges(out).select("lsn").collect().map(_.getLong(0)).sorted
    assert(lsns.toSeq === (1L to 7L))

    // read-side FINAL over the landed change log: truncate wiped 1 and 2,
    // key 3's latest version survives
    val state = CdcApply.applyReplacing(committedChanges(out), Seq("k"))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(state.toSet === Set((3L, "zz")))
  }

  test("A11 compaction twin: merged main table == raw landed log, files bounded") {
    val in = Files.createTempDirectory("graft_cmp_in")
    def cfg(threshold: Int) = StreamRunner.RunnerConfig(
      inputDir = in.toString,
      outputDir = Files.createTempDirectory(s"graft_cmp_out$threshold").toString,
      checkpointDir = Files.createTempDirectory(s"graft_cmp_ckpt$threshold").toString,
      tables = Seq(StreamRunner.TableConfig(
        "t", "ReplacingMergeTree", Seq("k"), ChangeRelation.testRow)),
      mergeThreshold = threshold)
    val compacted = cfg(2)
    val raw = cfg(0)

    def runBoth(): Unit = Seq(compacted, raw).foreach { c =>
      val qs = StreamRunner.run(spark, c)
      try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())
    }

    // three passes with checkpointed restarts between them → ≥3 batches
    writeFeed(in, "wal_000.json", Seq(
      jline(1, "I", 1, "a"), jline(2, "U", 1, "b"), jline(3, "I", 2, "x")))
    runBoth()
    writeFeed(in, "wal_001.json", Seq(
      jline(4, "D", 2, ""), jline(5, "I", 3, "z")))
    runBoth()
    writeFeed(in, "wal_002.json", Seq(
      jline(6, "U", 3, "zz"), jline(7, "I", 4, "w")))
    runBoth()

    // identical change logs and identical FINAL state either way
    def logRows(c: StreamRunner.RunnerConfig) =
      StreamRunner.changeLog(spark, c, "t").select("lsn")
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(logRows(compacted) === logRows(raw))
    assert(logRows(compacted) === (1L to 7L))
    def finalState(c: StreamRunner.RunnerConfig) =
      StreamRunner.readFinal(spark, c, "t").select("k", "v")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(finalState(compacted) === finalState(raw))
    assert(finalState(compacted) === Set((1L, "b"), (3L, "zz"), (4L, "w")))

    // bounded buffer growth on the compacted side; unbounded on raw
    val sink = new BufferedSink(s"${compacted.outputDir}/t", 2)
    assert(sink.liveBatchDirCount() < sink.committedBatches().size)
    assert(sink.liveBatchDirCount() <= 2)
  }

  test("merge-on-compact (CH part-merge analog): smaller log, identical FINAL") {
    val in = Files.createTempDirectory("graft_moc_in")
    def cfg(merge: Boolean) = StreamRunner.RunnerConfig(
      inputDir = in.toString,
      outputDir = Files.createTempDirectory(s"graft_moc_out$merge").toString,
      checkpointDir = Files.createTempDirectory(s"graft_moc_ckpt$merge").toString,
      tables = Seq(StreamRunner.TableConfig(
        "t", "ReplacingMergeTree", Seq("k"), ChangeRelation.testRow)),
      mergeThreshold = 2, mergeOnCompact = merge)
    val merged = cfg(true)
    val raw = cfg(false)

    def runBoth(): Unit = Seq(merged, raw).foreach { c =>
      val qs = StreamRunner.run(spark, c)
      try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())
    }

    // heavy churn on key 1 (superseded rows are mergeable), a truncate,
    // then more churn — three passes force ≥1 compaction on each side
    writeFeed(in, "wal_000.json", Seq(
      jline(1, "I", 1, "a"), jline(2, "U", 1, "b"), jline(3, "U", 1, "c")))
    runBoth()
    writeFeed(in, "wal_001.json", Seq(
      jline(4, "T", 0, ""), jline(5, "I", 1, "post-t"), jline(6, "I", 2, "x")))
    runBoth()
    writeFeed(in, "wal_002.json", Seq(
      jline(7, "U", 2, "y"), jline(8, "D", 1, "")))
    runBoth()

    def finalState(c: StreamRunner.RunnerConfig) =
      StreamRunner.readFinal(spark, c, "t").select("k", "v")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // truncate wiped lsn 1-3; key 1 deleted at lsn 8; key 2 latest = y
    assert(finalState(raw) === Set((2L, "y")))
    assert(finalState(merged) === finalState(raw))

    // the merged log is strictly smaller: within-segment superseded
    // churn (lsn 1,2 behind 3) is gone, truncates all survive
    val rawRows = StreamRunner.changeLog(spark, raw, "t").count()
    val mergedRows = StreamRunner.changeLog(spark, merged, "t").count()
    assert(rawRows === 8L)
    assert(mergedRows < rawRows, s"merge dropped nothing ($mergedRows rows)")
    assert(StreamRunner.changeLog(spark, merged, "t")
      .filter(col("op") === "T").count() === 1L, "truncate markers survive")
  }

  test("malformed WAL lines are dropped by policy, not poison pills") {
    val lines = Seq(
      jline(1, "I", 1, "a"),
      """{"this is not json""",
      """{"lsn":null,"op":"I","table":"t"}""", // null lsn → filtered
      jline(2, "I", 2, "b"))
    val df = ChangeFeed.fromJsonLines(
      spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING).toDF("value"),
      ChangeRelation.testRow)
    assert(df.select("lsn").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // strict mode keeps the nulls visible for fail-fast policies
    val strict = ChangeFeed.fromJsonLines(
      spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING).toDF("value"),
      ChangeRelation.testRow, dropMalformed = false)
    assert(strict.count() === 4L)
  }

  test("mid-stream crash replay: redelivered batch does not duplicate rows") {
    val out = Files.createTempDirectory("graft_replay_out").toString
    val sink = new BufferedSink(out)
    val changes = ChangeFeed.fromJsonLines(
      spark.createDataset(Seq(jline(1, "I", 1, "a"), jline(2, "I", 2, "b")))(
        org.apache.spark.sql.Encoders.STRING).toDF("value"),
      ChangeRelation.testRow)
    assert(sink.writeBatch(changes, 0))
    assert(!sink.writeBatch(changes, 0)) // crash between commit and ack: replay
    assert(committedChanges(out).count() === 2L)
  }
}
