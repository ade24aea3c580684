package graft.functions

import graft.SparkSpec
import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Salted joins must equal their plain twins row-for-row; bucketed
  * co-located joins must plan with zero shuffle Exchange.
  */
class SkewBucketingSpec extends SparkSpec {

  test("saltedJoin == plain join on a real fact-dim pair") {
    val orders = graft.core.t(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = graft.core.t(spark, sf001, "customer")
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted(Ordering.Tuple2[Long, String])
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", salts = 8)
      .select("o_orderkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted(Ordering.Tuple2[Long, String])
    assert(salted.length === plain.length)
    assert(salted.sameElements(plain))
  }

  test("salt is deterministic and spreads a hot key across sub-partitions") {
    import spark.implicits._
    // one hot key, 1000 distinct payloads
    val hot = (0 until 1000).map(i => (42L, i.toLong)).toDF("k", "payload")
    val salted = hot.withColumn("s", Skew.salt(8, col("payload")))
    val spread = salted.groupBy("s").count().collect().map(_.getLong(1))
    assert(spread.length === 8, "all 8 salt values used")
    assert(spread.max < 1000 / 2, "no salt bucket holds the majority")
    // re-evaluation yields identical salts (retry safety)
    val a = salted.collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val b = hot.withColumn("s", Skew.salt(8, col("payload")))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(a === b)
  }

  test("saltedJoin rejects join types the salt replication would corrupt") {
    import spark.implicits._
    val big = Seq((1L, "x")).toDF("k", "v")
    val small = Seq((1L, "y")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", 4, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", 4, joinType = "right")
    }
    // left-shaped types pass the guard
    assert(Skew.saltedJoin(big, small, "k", 4, joinType = "left_semi").count() === 1L)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    import spark.implicits._
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so the synthetic hot key qualifies as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~100k rows vs a uniform remainder
      val big = spark.range(100000).select(
        when(col("id") % 10 === 0, 1L).otherwise(col("id")).as("k"),
        concat(lit("payload_padding_padding_"), col("id")).as("v"))
      val small = spark.range(200).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = big.join(small, "k")
      // execute THIS queryExecution so AQE finalizes it (count() would
      // plan a separate execution and leave j's plan isFinalPlan=false)
      assert(j.collect().length > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in plan:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with zero shuffle Exchange") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        graft.core.t(spark, sf001, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_bkt", buckets = 8, key = "o_custkey")
      Bucketing.writeBucketed(
        graft.core.t(spark, sf001, "customer").select("c_custkey", "c_mktsegment"),
        "customer_bkt", buckets = 8, key = "c_custkey")
      val j = Bucketing.colocatedJoin(spark, "orders_bkt", "customer_bkt",
        "o_custkey", "c_custkey")
      assert(j.count() > 0)
      assert(Bucketing.isShuffleFree(j),
        s"expected exchange-free plan, got:\n${j.queryExecution.executedPlan}")
      // control: the same join over the raw (un-bucketed) parquet DOES shuffle
      val raw = graft.core.t(spark, sf001, "orders")
        .join(graft.core.t(spark, sf001, "customer"),
          col("o_custkey") === col("c_custkey"))
      raw.count()
      assert(!Bucketing.isShuffleFree(raw), "control join should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("bucketed shingle relation makes the dedup verify join exchange-free (VERDICT r07 #7)") {
    // The verified-dedup exact-Jaccard join shuffles the shingle-set
    // relation on doc_id EVERY run. Production organize-once/join-many
    // layout: write the shingle relation bucketed by doc_id once; every
    // subsequent verify (each ingest batch, each threshold sweep) joins
    // against it with ZERO Exchange on the shingle side — the shingle
    // sets (the heavy payload: arrays of text) never move again.
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the pipeline's exact shingle construction (TextQueries ≥3-word
      // docs → distinct 3-gram shingle sets)
      val shs = graft.core.t(spark, sf001, "documents")
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), expr(
          "array_distinct(transform(sequence(1, size(w) - 2), j -> concat_ws(' ', slice(w, j, 3))))")
          .as("s"))
      Bucketing.writeBucketed(shs, "shingles_bkt", buckets = 4, key = "doc_id")
      // candidate pairs land bucketed on d1 by the same layout (the band
      // join emits them partitioned; a synthetic pair set keeps the spec
      // fast — the plan shape is what is pinned here)
      val cand = shs.select(col("doc_id").as("d1"),
        (col("doc_id") + 1).as("d2"))
      Bucketing.writeBucketed(cand, "cand_bkt", buckets = 4, key = "d1")
      // verify leg 1: cand ⋈ shingles on d1 — both bucketed, no Exchange
      val withS1 = spark.table("cand_bkt")
        .join(spark.table("shingles_bkt"), col("d1") === col("doc_id"))
        .select(col("d1"), col("d2"), col("s").as("s1"))
      withS1.write.format("noop").mode("overwrite").save()
      assert(Bucketing.isShuffleFree(withS1),
        s"bucketed verify leg must not shuffle:\n${withS1.queryExecution.executedPlan}")
      // full verify: the second leg re-keys only the NARROW intermediate
      // (d1, d2, s1) on d2; the bucketed shingle side still reads in
      // place. Exactly ONE Exchange total (vs three un-bucketed).
      val verify = withS1
        .join(spark.table("shingles_bkt"), col("d2") === col("doc_id"))
        .withColumn("inter", size(array_intersect(col("s1"), col("s"))).cast("double"))
        .select(col("d1"), col("d2"), col("inter"))
      verify.write.format("noop").mode("overwrite").save()
      val plan = verify.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
      assert(exchanges <= 1,
        s"expected at most the intermediate's d2 re-key, got $exchanges Exchanges:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"shingle scans must read bucketed in place:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS shingles_bkt")
      spark.sql("DROP TABLE IF EXISTS cand_bkt")
    }
  }
}
