package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Path}
import org.apache.spark.sql.streaming.Trigger

/** Config-file entry point (VERDICT r02 "What's missing" #3): the full
  * replication boots from a pg2ch-shaped config file, and the inactivity
  * flush timeout reaches the streaming query as Trigger.ProcessingTime.
  */
class GraftConfigSpec extends SparkSpec {

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

  private def configText(in: String, out: String, ckpt: String): String =
    s"""# graft replication config (pg2ch-shaped)
       |input_dir: $in
       |output_dir: $out
       |checkpoint_dir: $ckpt
       |inactivity_flush_timeout: 250ms
       |merge_threshold: 2
       |tables:
       |  users:
       |    engine: ReplacingMergeTree
       |    key_columns: [k]
       |    columns: "k BIGINT, v STRING, amt DECIMAL(12,2)"
       |    buffer_size: 10
       |  audit:
       |    engine: MergeTree
       |    key_columns: [k]
       |    columns: "k BIGINT, v STRING, amt DECIMAL(12,2)"
       |""".stripMargin

  test("config file parses into the full runner shape") {
    val cfgFile = Files.createTempFile("graft_cfg", ".yml")
    Files.writeString(cfgFile, configText("/in", "/out", "/ckpt"))
    val cfg = GraftConfig.load(cfgFile.toString)
    assert(cfg.inputDir === "/in")
    assert(cfg.mergeThreshold === 2)
    assert(cfg.inactivityFlushMs === Some(250L))
    assert(cfg.tables.map(_.name) === Seq("users", "audit"))
    val users = cfg.tables.head
    assert(users.engine === "ReplacingMergeTree")
    assert(users.keyColumns === Seq("k"))
    assert(users.bufferSize === 10)
    assert(users.rowSchema.fieldNames.toSeq === ChangeRelation.testRow.fieldNames.toSeq)
    assert(users.rowSchema.map(_.dataType) === ChangeRelation.testRow.map(_.dataType))
  }

  test("wire-source auth/TLS settings parse and reach the client (config, not code)") {
    val cfgFile = Files.createTempFile("graft_cfg_tls", ".yml")
    Files.writeString(cfgFile,
      configText("/in", "/out", "/ckpt") +
        s"""source_wire: db.example:5433
           |source_user: repl
           |source_password: s3cret
           |source_ssl: verify-full
           |source_ssl_truststore: /etc/pg/root.p12
           |source_ssl_truststore_password: zzz
           |source_auth: scram
           |""".stripMargin)
    val cfg = GraftConfig.load(cfgFile.toString)
    assert(cfg.sourceWire === Some(("db.example", 5433)))
    assert(cfg.sourceUser === "repl")
    assert(cfg.sourcePassword === Some("s3cret"))
    assert(cfg.sourceSsl === "verify-full")
    assert(cfg.sourceSslTrustStore === Some("/etc/pg/root.p12"))
    assert(cfg.sourceSslTrustStorePassword === "zzz")
    assert(cfg.sourceAuth === "scram")
    // and the built client actually honors it: a TLS-demanding config
    // against a plaintext-only peer must refuse, not silently downgrade
    val stub = new StubPgWire(Seq(PgOutput.encodeRelation(1, 9, "t", Seq("k"))))
    val port = stub.start()
    try {
      val live = GraftConfig.load(cfgFile.toString).copy(
        inputDir = Files.createTempDirectory("graft_cfg_tls_in").toString,
        sourceWire = Some(("127.0.0.1", port)), sourceSsl = "require")
      val e = intercept[IllegalStateException](
        Replicator.wireClient(live, idleKeepalivesToStop = 2).get.run(0L))
      assert(e.getMessage.contains("refused SSL"))
      // flip the server to TLS: the same config streams end-to-end
      val tlsStub = new StubPgWire(
        Seq(PgOutput.encodeRelation(1, 9, "t", Seq("k")),
          PgOutput.encodeInsert(2, 9, Seq("1"))),
        password = Some("s3cret"),
        tlsContext = Some(TlsFixtures.serverContext(TlsFixtures.goodKeystore)))
      val tlsPort = tlsStub.start()
      try {
        val acked = Replicator.wireClient(
          live.copy(sourceWire = Some(("127.0.0.1", tlsPort))),
          idleKeepalivesToStop = 2).get.run(0L)
        assert(acked === 2L, "config-built client must speak SCRAM over TLS")
      } finally tlsStub.stop()
    } finally stub.stop()
  }

  test("boot the replication from the config file; trigger is wired") {
    val in = Files.createTempDirectory("graft_cfg_in")
    val out = Files.createTempDirectory("graft_cfg_out").toString
    val ckpt = Files.createTempDirectory("graft_cfg_ckpt").toString
    val cfgFile = Files.createTempFile("graft_cfg", ".yml")
    Files.writeString(cfgFile, configText(in.toString, out, ckpt))
    val cfg = GraftConfig.load(cfgFile.toString)

    writeFeed(in, "wal_000.json", Seq(
      j(1, "I", "users", 1, "a"), j(2, "U", "users", 1, "b"),
      j(3, "I", "audit", 100, "log-1")))

    val queries = StreamRunner.run(spark, cfg)
    try {
      // the inactivity timeout must reach the query as ProcessingTime —
      // assert on the running StreamExecution, not just our config object
      queries.foreach { q =>
        val exec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery
        assert(exec.trigger === Trigger.ProcessingTime(250L))
      }
      queries.foreach(_.processAllAvailable())
    } finally queries.foreach(_.stop())

    val users = StreamRunner.readFinal(spark, cfg, "users")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(users.toSet === Set((1L, "b")))
    val audit = StreamRunner.readFinal(spark, cfg, "audit")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(audit.toSet === Set((100L, "log-1")))
  }

  test("binary pgoutput feed boots from config with per-table relids") {
    val in = Files.createTempDirectory("graft_bin_in")
    val out = Files.createTempDirectory("graft_bin_out").toString
    val ckpt = Files.createTempDirectory("graft_bin_ckpt").toString
    val cfgFile = Files.createTempFile("graft_bin_cfg", ".yml")
    Files.writeString(cfgFile,
      s"""input_dir: ${in.toString}
         |output_dir: $out
         |checkpoint_dir: $ckpt
         |feed_format: pgoutput
         |tables:
         |  users:
         |    engine: ReplacingMergeTree
         |    key_columns: [k]
         |    columns: "k BIGINT, v STRING, amt DECIMAL(12,2)"
         |    relid: 42
         |""".stripMargin)
    val cfg = GraftConfig.load(cfgFile.toString)
    assert(cfg.feedFormat === "pgoutput")
    assert(cfg.tables.head.relId === 42)

    // one base64 text line per binary frame
    val b64 = java.util.Base64.getEncoder
    val frames = Seq(
      PgOutput.encodeInsert(1, 42, Seq("1", "a", null)),
      PgOutput.encodeUpdate(2, 42, Seq("1", "a", null), Seq("1", "b", null)),
      PgOutput.encodeInsert(3, 42, Seq("2", "x", "9.99")))
      .map(b64.encodeToString)
    writeFeed(in, "wal_000.b64", frames)

    val queries = StreamRunner.run(spark, cfg)
    try queries.foreach(_.processAllAvailable()) finally queries.foreach(_.stop())

    val users = StreamRunner.readFinal(spark, cfg, "users")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(users.toSet === Set((1L, "b"), (2L, "x")))
  }

  test("columns_map parses as target:source pairs; bad entries fail loudly") {
    val cfg = GraftConfig.parse(
      """input_dir: /in
        |output_dir: /out
        |checkpoint_dir: /ckpt
        |tables:
        |  users:
        |    engine: ReplacingMergeTree
        |    key_columns: [k]
        |    columns: "k BIGINT, v STRING"
        |    columns_map: [k:user_id, v:payload]
        |""".stripMargin)
    assert(cfg.tables.head.columnsMap === Map("k" -> "user_id", "v" -> "payload"))
    assert(cfg.tables.head.feedColumns === Seq("user_id", "payload"))
    assert(cfg.tables.head.mergeThreshold === None,
      "absent per-table merge_threshold falls back to the runner default")

    val bad = intercept[IllegalArgumentException](GraftConfig.parse(
      """input_dir: /in
        |output_dir: /out
        |checkpoint_dir: /ckpt
        |tables:
        |  users:
        |    engine: MergeTree
        |    columns: "k BIGINT"
        |    columns_map: [nocolon]
        |""".stripMargin))
    assert(bad.getMessage.contains("columns_map"))
  }

  test("malformed configs fail with a named missing key") {
    val noEngine =
      """input_dir: /in
        |output_dir: /out
        |checkpoint_dir: /ckpt
        |tables:
        |  t:
        |    columns: "k BIGINT"
        |""".stripMargin
    val e = intercept[IllegalArgumentException](GraftConfig.parse(noEngine))
    assert(e.getMessage.contains("engine"))
    val noTables = "input_dir: /in\noutput_dir: /out\ncheckpoint_dir: /ckpt\n"
    val e2 = intercept[IllegalArgumentException](GraftConfig.parse(noTables))
    assert(e2.getMessage.contains("no tables"))
  }

  test("the shipped example config parses and carries every knob") {
    val cfg = GraftConfig.load("examples/replication.yml")
    assert(cfg.tables.map(_.name) === Seq("users", "ledger", "audit"))
    assert(cfg.tables.map(_.engine) ===
      Seq("ReplacingMergeTree", "CollapsingMergeTree", "MergeTree"))
    assert(cfg.mergeThreshold === 8)
    assert(cfg.mergeOnCompact)
    assert(cfg.inactivityFlushMs === Some(5000L))
    assert(cfg.feedFormat === "json")
    assert(cfg.tables.map(_.relId) === Seq(42, 43, 44))
  }

  test("ssl/auth misconfiguration fails at CONFIG LOAD, not at first connect") {
    // ADVICE r13: a typo'd sslmode or a verify-* mode missing its trust
    // store used to surface only when PgWireClient was constructed
    def withWire(extra: String): String =
      configText("/in", "/out", "/ckpt") +
        s"source_wire: db.example:5433\n$extra\n"
    val e1 = intercept[IllegalArgumentException](
      GraftConfig.parse(withWire("source_ssl: requied")))
    assert(e1.getMessage.contains("source_ssl"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      GraftConfig.parse(withWire("source_ssl: verify-ca")))
    assert(e2.getMessage.contains("source_ssl_truststore"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      GraftConfig.parse(withWire("source_auth: kerberos")))
    assert(e3.getMessage.contains("source_auth"), e3.getMessage)
    // the valid forms still load
    assert(GraftConfig.parse(withWire("source_ssl: require")).sourceSsl === "require")
    assert(GraftConfig.parse(withWire("source_auth: md5")).sourceAuth === "md5")
  }

  test("durations parse across units") {
    assert(GraftConfig.durationMs("500ms") === 500L)
    assert(GraftConfig.durationMs("5s") === 5000L)
    assert(GraftConfig.durationMs("2m") === 120000L)
    assert(GraftConfig.durationMs("1h") === 3600000L)
    intercept[IllegalArgumentException](GraftConfig.durationMs("fast"))
  }
}
