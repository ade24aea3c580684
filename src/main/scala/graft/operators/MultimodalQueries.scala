package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._

/** Multimodal plumbing exercised as a declared query: documents.text cast
  * to a binary payload, stub-decoded to deterministic metadata (payload-md5
  * derived — see graft.multimodal.Multimodal). The oracle replicates the
  * same arithmetic, so the full binary-column pipeline shape is
  * hash-checked even with the codec stubbed.
  */
object MultimodalQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    "multimodal_meta_extract" -> QueryDef(
      (spark, dir) => {
        val assets = graft.multimodal.Multimodal.assetsFrom(
          t(spark, dir, "documents"), "doc_id", "text", "text")
        graft.multimodal.Multimodal.stubDecodeCols(assets)
          .select(col("asset_id"), col("modality"),
            length(col("bytes")).cast("long").as("n_bytes"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("duration_ms"))
          .orderBy(col("asset_id"))
          .limit(300)
      },
      // n_bytes counts BYTES on both sides (Spark: length over BINARY;
      // DuckDB: octet_length over BLOB) — `length(text)` counts CHARS and
      // would diverge on any non-ASCII document.
      Some("""SELECT doc_id AS asset_id, 'text' AS modality,
             |CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             |CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 1024 AS width,
             |CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 1024 AS height,
             |CAST('0x' || substr(md5(text), 9, 6) AS BIGINT) % 600000 AS duration_ms
             |FROM documents ORDER BY asset_id LIMIT 300""".stripMargin.replace("\n", " ")),
      tier = "E"),

    // Frame sampling: every 4th frame index of each asset via posexplode
    // (a Generator — zero shuffle). n_frames is the stub decode's
    // byte-length-derived count; floor() on both sides because Spark's
    // int cast truncates while DuckDB's rounds.
    "multimodal_frame_sample" -> QueryDef(
      (spark, dir) => {
        val assets = graft.multimodal.Multimodal.assetsFrom(
          t(spark, dir, "documents"), "doc_id", "text", "text")
        val decoded = graft.multimodal.Multimodal.stubDecodeCols(assets)
        graft.multimodal.Multimodal.sampleFrames(decoded, stride = 4)
          .select(col("asset_id"), col("n_frames").cast("long").as("n_frames"),
            col("frame_idx").cast("long").as("frame_idx"))
          .orderBy(col("asset_id"), col("frame_idx"))
          .limit(500)
      },
      Some("""SELECT asset_id, n_frames, frame_idx FROM (
             |SELECT doc_id AS asset_id,
             |CAST(floor(octet_length(CAST(text AS BLOB)) / 256.0) + 1 AS BIGINT) AS n_frames,
             |unnest(range(0, CAST(floor(octet_length(CAST(text AS BLOB)) / 256.0) + 1 AS BIGINT))) AS frame_idx
             |FROM documents)
             |WHERE frame_idx % 4 = 0 ORDER BY asset_id, frame_idx LIMIT 500""".stripMargin.replace("\n", " ")),
      tier = "E"),

    // Multimodal -> ANN integration: stub feature extraction (the batch
    // shape a real vision/audio encoder emits — one fixed-dim float array
    // per asset) feeding the brute-force cosine top-k path. The whole
    // lane — binary column -> feature array -> similarity search — is
    // oracle-checked end-to-end even with the encoder stubbed.
    "multimodal_feature_ann" -> QueryDef(
      (spark, dir) => {
        graft.plans.DotProductD.register(spark)
        def gdot(a: String, b: String) = expr(s"graft_dot($a, $b)")
        val assets = graft.multimodal.Multimodal.assetsFrom(
          t(spark, dir, "documents"), "doc_id", "text", "text")
        val feats = graft.multimodal.Multimodal.stubFeatures(assets)
          .select(col("asset_id"), col("features"))
        val probes = feats.filter(col("asset_id") < 5)
          .select(col("asset_id").as("probe"), col("features").as("pv"),
            sqrt(gdot("features", "features")).as("pn"))
        val cands = feats
          .select(col("asset_id").as("cand"), col("features").as("cv"),
            sqrt(gdot("features", "features")).as("cn"))
        val w = Window.partitionBy("probe").orderBy(col("sim").desc, col("cand"))
        broadcast(probes).join(cands, col("probe") =!= col("cand"))
          .withColumn("sim", pround(gdot("pv", "cv") / (col("pn") * col("cn")), 6))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("probe"), col("cand"), col("sim"))
          .orderBy(col("probe"), col("sim").desc, col("cand"))
      },
      Some {
        // the exact stubFeatures arithmetic (md5-chunk / 65535 -> REAL),
        // widened to DOUBLE[] for the same sequential cosine fold
        val lanes = (0 until 16).map { i =>
          s"CAST(CAST('0x' || substr(md5(text), ${(i % 7) * 4 + 1}, 4) AS BIGINT) / 65535.0 AS REAL)"
        }.mkString(", ")
        val cos =
          "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
        val cosR = proundSql(cos, 6)
        s"""WITH f AS (SELECT doc_id AS asset_id,
           |CAST(list_value($lanes) AS DOUBLE[]) AS v FROM documents)
           |SELECT probe, cand, sim FROM (
           |SELECT a.asset_id AS probe, b.asset_id AS cand, $cosR AS sim,
           |row_number() OVER (PARTITION BY a.asset_id ORDER BY $cosR DESC, b.asset_id) AS rn
           |FROM f a JOIN f b ON a.asset_id < 5 AND b.asset_id <> a.asset_id)
           |WHERE rn <= 3 ORDER BY probe, sim DESC, cand""".stripMargin.replace("\n", " ")
      },
      tier = "E"))
}
