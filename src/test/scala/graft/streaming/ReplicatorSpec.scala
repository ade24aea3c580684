package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** §3.1 startup lifecycle: snapshot → stream handoff. Every row is either
  * in the snapshot or in the stream; a streamed change wins over its
  * snapshot row; a crashed bootstrap re-runs without duplication.
  */
class ReplicatorSpec extends SparkSpec {

  import spark.implicits._

  private def j(lsn: Long, op: String, k: Long, v: String): String = {
    val after = if (op == "I" || op == "U") s""","after":{"k":$k,"v":"$v"}""" else ""
    val before = if (op == "U" || op == "D") s""","before":{"k":$k,"v":"old"}""" else ""
    s"""{"lsn":$lsn,"op":"$op","table":"users"$before$after}"""
  }

  private def writeFeed(dir: Path, name: String, lines: Seq[String]): Unit = {
    val tmp = dir.resolve(s".$name.tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, dir.resolve(name))
  }

  test("snapshot then stream: final state = snapshot overlaid with changes") {
    val in = Files.createTempDirectory("graft_repl_in")
    val cfg = StreamRunner.RunnerConfig(
      inputDir = in.toString,
      outputDir = Files.createTempDirectory("graft_repl_out").toString,
      checkpointDir = Files.createTempDirectory("graft_repl_ckpt").toString,
      tables = Seq(StreamRunner.TableConfig(
        "users", "ReplacingMergeTree", Seq("k"), ChangeRelation.testRow)),
      mergeThreshold = 2)

    // initial table state (what pg2ch would COPY at the slot snapshot)
    val snap = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("k", "v").withColumn("amt", org.apache.spark.sql.functions.lit(null)
        .cast(org.apache.spark.sql.types.DecimalType(12, 2)))

    // stream traffic recorded after the snapshot point: update 1,
    // delete 2, insert 4
    writeFeed(in, "wal_000.json", Seq(
      j(10, "U", 1, "one-v2"), j(11, "D", 2, ""), j(12, "I", 4, "four")))

    val queries = Replicator.bootstrap(spark, cfg, Map("users" -> snap))
    try queries.foreach(_.processAllAvailable()) finally queries.foreach(_.stop())

    val state = StreamRunner.readFinal(spark, cfg, "users")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state === Set((1L, "one-v2"), (3L, "three"), (4L, "four")))

    // crashed-bootstrap re-run: the snapshot batch is already committed,
    // the stream resumes from its checkpoint — nothing duplicates
    assert(!Replicator.snapshot(spark, cfg, "users", snap))
    val queries2 = Replicator.bootstrap(spark, cfg, Map("users" -> snap))
    try queries2.foreach(_.processAllAvailable()) finally queries2.foreach(_.stop())
    val total = StreamRunner.changeLog(spark, cfg, "users").count()
    assert(total === 3L + 3L) // 3 snapshot rows + 3 streamed changes

    // the landed log orders snapshot rows strictly before stream batches
    val sink = new BufferedSink(s"${cfg.outputDir}/users", cfg.mergeThreshold)
    val ordered = sink.readCommitted(spark)
      .orderBy("__row_id").select("lsn").collect().map(_.getLong(0))
    assert(ordered.take(3).forall(_ === 0L), "snapshot rows sort first")
  }

  test("a table without a snapshot starts empty and streams from scratch") {
    val in = Files.createTempDirectory("graft_repl2_in")
    val cfg = StreamRunner.RunnerConfig(
      inputDir = in.toString,
      outputDir = Files.createTempDirectory("graft_repl2_out").toString,
      checkpointDir = Files.createTempDirectory("graft_repl2_ckpt").toString,
      tables = Seq(StreamRunner.TableConfig(
        "users", "ReplacingMergeTree", Seq("k"), ChangeRelation.testRow)))
    writeFeed(in, "wal_000.json", Seq(j(1, "I", 7, "seven")))
    val queries = Replicator.bootstrap(spark, cfg, Map.empty)
    try queries.foreach(_.processAllAvailable()) finally queries.foreach(_.stop())
    val state = StreamRunner.readFinal(spark, cfg, "users")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(state.toSet === Set((7L, "seven")))
  }
}
