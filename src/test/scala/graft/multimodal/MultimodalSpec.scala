package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: schema, stub decode determinism,
  * frame sampling shape, feature batch shape (north-star requirement —
  * codecs stubbed, pipeline real).
  */
class MultimodalSpec extends SparkSpec {

  private def assets = Multimodal.assetsFrom(
    graft.core.t(spark, sf001, "documents"), "doc_id", "text", "image")

  test("asset schema: binary payload + typed columns") {
    val a = assets
    assert(a.schema("bytes").dataType === org.apache.spark.sql.types.BinaryType)
    assert(a.schema("asset_id").dataType === org.apache.spark.sql.types.LongType)
    assert(a.count() === 500)
  }

  test("stub decode is deterministic and bounded") {
    val d1 = Multimodal.stubDecodeCols(assets).select("asset_id", "width", "height", "duration_ms")
    val d2 = Multimodal.stubDecodeCols(assets).select("asset_id", "width", "height", "duration_ms")
    assert(d1.exceptAll(d2).count() === 0)
    val bad = Multimodal.stubDecodeCols(assets)
      .filter(col("width") < 0 || col("width") >= 1024 ||
        col("height") < 0 || col("height") >= 1024 ||
        col("duration_ms") < 0 || col("duration_ms") >= 600000)
    assert(bad.count() === 0)
  }

  test("frame sampling explodes n_frames rows with the stride applied") {
    val decoded = Multimodal.stubDecodeCols(assets.limit(10))
    val frames = Multimodal.sampleFrames(decoded, stride = 2)
    val perAsset = frames.groupBy("asset_id").count()
      .join(decoded.select("asset_id", "n_frames"), "asset_id")
      .filter(col("count") =!= ceil(col("n_frames") / 2.0))
    assert(perAsset.count() === 0)
  }

  test("stub features: fixed dim, [0,1] floats — ANN-ready batch shape") {
    val f = Multimodal.stubFeatures(assets.limit(20), dim = 16)
    val sizes = f.select(size(col("features"))).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq === Seq(16))
    val bad = f.select(explode(col("features")).as("x")).filter(col("x") < 0 || col("x") > 1)
    assert(bad.count() === 0)
  }

  test("real decoder is an explicit stub") {
    intercept[NotImplementedError] {
      Multimodal.decodeReal(Array[Byte](1, 2), "image")
    }
  }

  test("decodeWith runs an injected codec per-partition, no shuffle") {
    // fake codec: metadata from payload length — what a real decoder's
    // plumbing looks like, minus the media library
    val decoded = Multimodal.decodeWith(assets.limit(50)) { (bytes, modality) =>
      Multimodal.DecodedMeta(bytes.length, bytes.length / 2, bytes.length * 10L,
        bytes.length / 256 + 1)
    }
    val rows = decoded.collect()
    assert(rows.length === 50)
    assert(decoded.schema.fieldNames.toSeq ===
      Seq("asset_id", "modality", "width", "height", "duration_ms", "n_frames"))
    // width == payload length == n_chars for this ASCII corpus
    val joined = decoded.join(
      graft.core.t(spark, sf001, "documents").select(col("doc_id").as("asset_id"), col("n_chars")),
      "asset_id").filter(col("width") =!= col("n_chars"))
    assert(joined.count() === 0)
    // plan stays shuffle-free up to the decode (Generator/map only)
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
  }

  test("resizeMeta fits within bounds and preserves aspect ratio") {
    val decoded = Multimodal.stubDecodeCols(assets.limit(100))
    val resized = Multimodal.resizeMeta(decoded, maxW = 256, maxH = 128)
    val bad = resized.filter(
      col("out_width") > 256 || col("out_height") > 128 ||
        col("out_width") < 1 || col("out_height") < 1)
    assert(bad.count() === 0)
    // one side always binds exactly
    val binding = resized.filter(col("out_width") === 256 || col("out_height") === 128)
    assert(binding.count() === resized.count())
    // exact agreement with a reference implementation of the fit formula
    val rows = resized.select("width", "height", "out_width", "out_height").collect()
    rows.foreach { r =>
      val w = math.max(r.getInt(0).toLong, 1L)
      val h = math.max(r.getInt(1).toLong, 1L)
      val (ew, eh) =
        if (w * 128 >= h * 256) (256L, math.max(h * 256 / w, 1L))
        else (math.max(w * 128 / h, 1L), 128L)
      assert((r.getInt(2).toLong, r.getInt(3).toLong) === ((ew, eh)),
        s"w=$w h=$h")
    }
  }
}
