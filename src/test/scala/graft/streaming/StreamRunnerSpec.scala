package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** The full pg2ch shape: one shared WAL feed, two tables with DIFFERENT
  * engines replicated concurrently, engine-correct read-side state.
  */
class StreamRunnerSpec extends SparkSpec {

  private def j(lsn: Long, op: String, table: String, k: Long, v: String): String = {
    val after = if (op == "I" || op == "U") s""","after":{"k":$k,"v":"$v"}""" else ""
    val before = if (op == "U" || op == "D") s""","before":{"k":$k,"v":"old"}""" else ""
    s"""{"lsn":$lsn,"op":"$op","table":"$table"$before$after}"""
  }

  private def writeFeed(dir: Path, name: String, lines: Seq[String]): Unit = {
    val tmp = dir.resolve(s".$name.tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, dir.resolve(name))
  }

  test("two tables, two engines, one feed: each target gets its own semantics") {
    val in = Files.createTempDirectory("graft_runner_in")
    val cfg = StreamRunner.RunnerConfig(
      inputDir = in.toString,
      outputDir = Files.createTempDirectory("graft_runner_out").toString,
      checkpointDir = Files.createTempDirectory("graft_runner_ckpt").toString,
      tables = Seq(
        StreamRunner.TableConfig("users", "ReplacingMergeTree", Seq("k"),
          ChangeRelation.testRow),
        StreamRunner.TableConfig("audit", "MergeTree", Seq("k"),
          ChangeRelation.testRow)))

    // interleaved feed: users gets I/U/D churn, audit is append-only
    writeFeed(in, "wal_000.json", Seq(
      j(1, "I", "users", 1, "a"), j(2, "I", "audit", 100, "log-1"),
      j(3, "U", "users", 1, "b"), j(4, "I", "users", 2, "x"),
      j(5, "I", "audit", 101, "log-2"), j(6, "D", "users", 2, "")))

    val queries = StreamRunner.run(spark, cfg)
    try {
      queries.foreach(_.processAllAvailable())
    } finally {
      queries.foreach(_.stop())
    }

    val users = StreamRunner.readFinal(spark, cfg, "users")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(users.toSet === Set((1L, "b"))) // key 2 deleted, key 1 latest

    val audit = StreamRunner.readFinal(spark, cfg, "audit")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(audit.toSet === Set((100L, "log-1"), (101L, "log-2")))

    // per-table change logs carry ONLY their own relation's rows
    assert(StreamRunner.changeLog(spark, cfg, "users").count() === 4L)
    assert(StreamRunner.changeLog(spark, cfg, "audit").count() === 2L)
  }

  test("clickhouse_url ships engine-encoded rows alongside the landed log") {
    val ch = new graft.sinks.StubCH
    try {
      val in = Files.createTempDirectory("graft_ch_in")
      val cfg = StreamRunner.RunnerConfig(
        inputDir = in.toString,
        outputDir = Files.createTempDirectory("graft_ch_out").toString,
        checkpointDir = Files.createTempDirectory("graft_ch_ckpt").toString,
        tables = Seq(
          StreamRunner.TableConfig("users", "ReplacingMergeTree", Seq("k"),
            ChangeRelation.testRow),
          StreamRunner.TableConfig("ledger", "CollapsingMergeTree", Seq("k"),
            ChangeRelation.testRow)),
        clickhouseUrl = Some(ch.endpoint))

      writeFeed(in, "wal_000.json", Seq(
        j(1, "I", "users", 1, "a"), j(2, "U", "users", 1, "b"),
        j(3, "D", "users", 2, ""),
        j(4, "I", "ledger", 10, "x"), j(5, "U", "ledger", 10, "y")))

      val queries = StreamRunner.run(spark, cfg)
      try queries.foreach(_.processAllAvailable()) finally queries.foreach(_.stop())

      // Replacing wire rows: k \t v \t amt \t ver \t deleted
      val users = ch.lines("users").map(_.split("\t", -1)).map(c =>
        (c(0), c(1), c(3), c(4))).toSet
      assert(users === Set(
        ("1", "a", "1", "0"), ("1", "b", "2", "0"), // upserts, ver = lsn
        ("2", "old", "3", "1"))) // DELETE ships the old tuple as tombstone

      // Collapsing wire rows: k \t v \t amt \t sign — update = (-1, +1) pair
      val ledger = ch.lines("ledger").map(_.split("\t", -1)).map(c =>
        (c(0), c(1), c(3))).toSet
      assert(ledger === Set(
        ("10", "x", "1"), ("10", "old", "-1"), ("10", "y", "1")))

      // the landed parquet log is unaffected by the tee
      assert(StreamRunner.changeLog(spark, cfg, "users").count() === 3L)
    } finally ch.stop()
  }
}
