package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** The COMPLETE pg2ch shape in one test, driven exactly the way a user of
  * the reference would drive it: a config file declares the tables
  * (engines, key columns, column rename map, per-table compaction, CH
  * endpoint), `Replicator.bootstrap` lands a consistent snapshot and
  * starts the routed stream over a BINARY pgoutput feed, churn + a
  * truncate flow through, the stream restarts from its checkpoint, and
  * at the end the engine-correct FINAL state, the ClickHouse mirror, the
  * compaction bound, and exactly-once delivery all hold at once.
  */
class EndToEndSpec extends SparkSpec {

  private def writeFeed(dir: Path, name: String, frames: Seq[Array[Byte]]): Unit = {
    val b64 = java.util.Base64.getEncoder
    val tmp = dir.resolve(s".$name.tmp")
    Files.writeString(tmp, frames.map(b64.encodeToString).mkString("", "\n", "\n"))
    Files.move(tmp, dir.resolve(name))
  }

  test("config file → snapshot → binary stream → restart → FINAL + CH mirror + compaction") {
    import spark.implicits._
    val ch = new graft.sinks.StubCH
    try {
      val in = Files.createTempDirectory("graft_e2e_in")
      val out = Files.createTempDirectory("graft_e2e_out").toString
      val ckpt = Files.createTempDirectory("graft_e2e_ckpt").toString
      val cfgFile = Files.createTempFile("graft_e2e", ".yml")
      Files.writeString(cfgFile,
        s"""# full pg2ch-shaped deployment
           |input_dir: $in
           |output_dir: $out
           |checkpoint_dir: $ckpt
           |feed_format: pgoutput
           |merge_threshold: 2
           |clickhouse_url: ${ch.endpoint}
           |tables:
           |  users:
           |    engine: ReplacingMergeTree
           |    key_columns: [k]
           |    columns: "k BIGINT, v STRING, amt DECIMAL(12,2)"
           |    columns_map: [k:user_id, v:payload, amt:amount]
           |    relid: 42
           |  audit:
           |    engine: MergeTree
           |    key_columns: [k]
           |    columns: "k BIGINT, v STRING, amt DECIMAL(12,2)"
           |    merge_threshold: 0
           |    relid: 43
           |""".stripMargin)
      val cfg = GraftConfig.load(cfgFile.toString)

      // ---- bootstrap: users has a pre-existing snapshot (pg2ch's COPY)
      val snapshot = Seq((100L, "snap", BigDecimal("1.00")), (101L, "snap", null))
        .toDF("k", "v", "amt")
        .select($"k", $"v", $"amt".cast("decimal(12,2)"))
      var queries = Replicator.bootstrap(spark, cfg, Map("users" -> snapshot))
      try {
        // feed 1: R frames (feed-side column names!), churn on both tables
        writeFeed(in, "wal_000.b64", Seq(
          PgOutput.encodeRelation(0, 42, "users", Seq("user_id", "payload", "amount")),
          PgOutput.encodeRelation(0, 43, "audit", Seq("k", "v", "amt")),
          PgOutput.encodeInsert(1, 42, Seq("1", "a", null)),
          PgOutput.encodeUpdate(2, 42, Seq("100", "snap", "1.00"), Seq("100", "updated", "2.50")),
          PgOutput.encodeInsert(3, 43, Seq("900", "log-1", null))))
        queries.foreach(_.processAllAvailable())
      } finally queries.foreach(_.stop())

      // ---- restart from the checkpoint (pg2ch process bounce): delete a
      // key, truncate audit, then append fresh rows to both
      queries = StreamRunner.run(spark, cfg)
      try {
        writeFeed(in, "wal_001.b64", Seq(
          PgOutput.encodeDelete(4, 42, Seq("101", "snap", null)),
          PgOutput.encodeTruncate(5, Seq(43)),
          PgOutput.encodeInsert(6, 43, Seq("901", "log-2", null)),
          PgOutput.encodeInsert(7, 42, Seq("2", "b", "9.99"))))
        queries.foreach(_.processAllAvailable())
        // an idle restart pass must land nothing new (exactly-once)
        queries.foreach(_.processAllAvailable())
      } finally queries.foreach(_.stop())

      // ---- engine-correct FINAL: snapshot overlaid with the stream
      val users = StreamRunner.readFinal(spark, cfg, "users")
        .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(users === Set((1L, "a"), (2L, "b"), (100L, "updated")),
        "latest version per key; key 101 deleted; renamed feed columns mapped")

      val audit = StreamRunner.readFinal(spark, cfg, "audit")
        .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(audit === Set((901L, "log-2")), "truncate wiped pre-truncate appends")

      // ---- exactly-once: every streamed change landed exactly once
      val userLsns = StreamRunner.changeLog(spark, cfg, "users")
        .select("lsn").collect().map(_.getLong(0)).sorted.toSeq
      assert(userLsns === Seq(0L, 0L, 1L, 2L, 4L, 7L),
        "two snapshot rows at lsn 0 plus each streamed change once")

      // ---- CH mirror: Replacing wire rows ship with ver/deleted; the
      // audit truncate reached the mirror as TRUNCATE TABLE
      assert(ch.truncates.contains("audit"))
      val mirrorAudit = ch.lines("audit").map(_.split("\t", -1)(0)).toSet
      assert(mirrorAudit === Set("901"), "mirror holds only post-truncate audit rows")
      val mirrorUsers = ch.lines("users").map(_.split("\t", -1)).map(c => (c(0), c(4))).toSet
      // tombstone for the deleted key 101 plus the live upserts (the
      // snapshot itself ships via COPY in pg2ch, not the stream — here it
      // lands only in the table log, so the mirror sees streamed rows)
      assert(mirrorUsers.contains(("101", "1")), "DELETE ships as a tombstone")
      assert(mirrorUsers.contains(("1", "0")) && mirrorUsers.contains(("2", "0")))

      // ---- compaction: users (threshold 2) bounded; audit (override 0) raw
      assert(StreamRunner.sinkFor(cfg, "users").liveBatchDirCount() <= 2)
      assert(StreamRunner.sinkFor(cfg, "audit").compactedBatches().isEmpty)
    } finally ch.stop()
  }
}
