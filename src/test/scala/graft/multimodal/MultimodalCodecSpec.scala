package graft.multimodal

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Laws for the REAL uncompressed-media codecs (WAV PCM-16, PPM P6) and
  * their integration into the multimodal decode seam: roundtrips are
  * byte-exact, malformed inputs are poison-pilled (never thrown), and
  * `decodeWith(decodeReal)` over real encoded assets yields exact
  * metadata — the decode kernel the declared pipeline shapes were
  * designed to receive.
  */
class MultimodalCodecSpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 40): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // deterministic pseudo-PCM: integer sine-ish wave, no RNG
  private def pcm(n: Int, amp: Int, period: Int): Array[Short] =
    Array.tabulate(n)(i => ((i % period - period / 2) * amp / period).toShort)

  test("WAV roundtrip law: encode . decode = identity (rate, channels, samples)") {
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      ch <- Gen.choose(1, 2)
      n <- Gen.choose(0, 2000)
      amp <- Gen.choose(1, 32000)
    } yield WavCodec.Wav(rate, ch, pcm(n * ch, amp, 37))
    check(Prop.forAll(gen) { w =>
      WavCodec.decode(WavCodec.encode(w)).contains(
        WavCodec.Wav(w.sampleRate, w.channels, w.samples)) ||
        // Array equality is reference-based; compare fields explicitly
        WavCodec.decode(WavCodec.encode(w)).exists(d =>
          d.sampleRate == w.sampleRate && d.channels == w.channels &&
            java.util.Arrays.equals(d.samples, w.samples))
    })
  }

  test("WAV decode skips unknown chunks and poison-pills malformation") {
    val w = WavCodec.Wav(16000, 1, pcm(100, 1000, 37))
    val canonical = WavCodec.encode(w)
    // splice a LIST chunk between fmt and data (real encoders do this)
    val fmtEnd = 12 + 8 + 16
    val list = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    list.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    val spliced = canonical.take(fmtEnd) ++ list.array() ++ canonical.drop(fmtEnd)
    val d = WavCodec.decode(spliced)
    assert(d.exists(x => x.sampleRate == 16000 &&
      java.util.Arrays.equals(x.samples, w.samples)))
    // malformations: bad magic, truncated data, absurd chunk length
    assert(WavCodec.decode("JUNK".getBytes ++ canonical.drop(4)).isEmpty)
    assert(WavCodec.decode(canonical.dropRight(7)).isEmpty)
    val badLen = canonical.clone()
    badLen(40) = 0x7f.toByte // inflate declared data length past buffer
    badLen(41) = 0x7f.toByte
    assert(WavCodec.decode(badLen).isEmpty)
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("PPM roundtrip law + header grammar (comments, whitespace) + truncation") {
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
    } yield PpmCodec.Ppm(w, h, 255,
      Array.tabulate(w * h * 3)(i => (i * 31 % 251).toByte))
    check(Prop.forAll(gen) { p =>
      PpmCodec.decode(PpmCodec.encode(p)).exists(d =>
        d.width == p.width && d.height == p.height && d.maxVal == p.maxVal &&
          java.util.Arrays.equals(d.pixels, p.pixels))
    })
    // a commented, whitespace-liberal header is the same image
    val px = Array.tabulate(2 * 3 * 3)(i => i.toByte)
    val commented = "P6 # binary ppm\n# a comment line\n 2\t3 \n255\n".getBytes("US-ASCII") ++ px
    assert(PpmCodec.decode(commented).exists(d =>
      d.width == 2 && d.height == 3 && java.util.Arrays.equals(d.pixels, px)))
    assert(PpmCodec.decode(PpmCodec.encode(
      PpmCodec.Ppm(2, 3, 255, px)).dropRight(1)).isEmpty)
    assert(PpmCodec.decode("P5\n2 3\n255\n".getBytes("US-ASCII") ++ px).isEmpty)
  }

  test("decodeWith(decodeReal): real assets through the partition-iterator seam") {
    import spark.implicits._
    val wavBytes = WavCodec.encode(WavCodec.Wav(16000, 1, pcm(16000, 9000, 37))) // 1s
    val ppmBytes = PpmCodec.encode(PpmCodec.Ppm(64, 48, 255,
      Array.tabulate(64 * 48 * 3)(i => (i % 199).toByte)))
    val assets = Seq(
      (1L, "audio/wav", wavBytes),
      (2L, "image/ppm", ppmBytes),
      (3L, "audio/wav", "not a wav".getBytes("US-ASCII")) // corrupt asset
    ).toDF("asset_id", "modality", "bytes")
    val decoded = Multimodal.decodeWith(assets)(Multimodal.decodeReal)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getInt(5))).toMap
    assert(decoded(1L) === ((16000, 1, 1000L, 63))) // 16000 samples / 256 ceil
    assert(decoded(2L) === ((64, 48, 0L, 1)))
    assert(decoded(3L) === ((0, 0, 0L, 0)), "corrupt asset poison-pills, not throws")
  }

  // ---- compressed images via javax.imageio (pure-JVM, no native libs) ----

  // 64×64 image whose 16×16 cells are dark/bright per a 16-bit mask —
  // by construction gridFeatures(4) binarized against its own mean
  // recovers exactly `mask`, and the pattern survives JPEG loss.
  private def maskImage(mask: Int): ImageIoCodec.Img = {
    val px = new Array[Byte](64 * 64 * 3)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val cell = (y / 16) * 4 + (x / 16)
        val v = if (((mask >> cell) & 1) == 1) 220.toByte else 30.toByte
        val o = (y * 64 + x) * 3
        px(o) = v; px(o + 1) = v; px(o + 2) = v
        x += 1
      }
      y += 1
    }
    ImageIoCodec.Img(64, 64, px)
  }

  test("ImageIO PNG/BMP roundtrip law: encode . decode = identity on RGB") {
    val gen = for {
      w <- Gen.choose(1, 32)
      h <- Gen.choose(1, 32)
      fmt <- Gen.oneOf("png", "bmp")
    } yield (ImageIoCodec.Img(w, h,
      Array.tabulate(w * h * 3)(i => (i * 37 % 256).toByte)), fmt)
    check(Prop.forAll(gen) { case (img, fmt) =>
      ImageIoCodec.decode(ImageIoCodec.encode(img, fmt)).exists(d =>
        d.width == img.width && d.height == img.height &&
          java.util.Arrays.equals(d.pixels, img.pixels))
    }, n = 25)
  }

  test("ImageIO JPEG: lossy but dimension-exact; grid features survive the loss") {
    val img = maskImage(0x1234)
    val jpg = ImageIoCodec.encode(img, "jpg")
    val d = ImageIoCodec.decode(jpg)
    assert(d.exists(x => x.width == 64 && x.height == 64))
    val f0 = ImageIoCodec.gridFeatures(img)
    val f1 = ImageIoCodec.gridFeatures(d.get)
    assert(f0.length === 16)
    f0.zip(f1).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.1, s"JPEG loss moved a grid cell $a -> $b")
    }
  }

  test("ImageIO decode poison-pills malformation (junk, truncation, empty)") {
    val png = ImageIoCodec.encode(maskImage(0xAB12), "png")
    assert(ImageIoCodec.decode(png).isDefined)
    assert(ImageIoCodec.decode(Array.emptyByteArray).isEmpty)
    assert(ImageIoCodec.decode("definitely not an image".getBytes("US-ASCII")).isEmpty)
    assert(ImageIoCodec.decode(png.take(24)).isEmpty, "truncated PNG header")
    assert(ImageIoCodec.decode(null).isEmpty)
    val jpgTrunc = ImageIoCodec.encode(maskImage(0x00FF), "jpg").take(40)
    assert(ImageIoCodec.decode(jpgTrunc).isEmpty, "truncated JPEG")
  }

  test("decodeWith(decodeReal): JPEG/PNG assets yield real dimensions") {
    import spark.implicits._
    val assets = Seq(
      (1L, "image/png", ImageIoCodec.encode(maskImage(0xF0F0), "png")),
      (2L, "image/jpeg", ImageIoCodec.encode(maskImage(0x0F0F), "jpg")),
      (3L, "image/jpeg", "corrupt jpeg".getBytes("US-ASCII"))
    ).toDF("asset_id", "modality", "bytes")
    val decoded = Multimodal.decodeWith(assets)(Multimodal.decodeReal)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(decoded(1L) === ((64, 64)))
    assert(decoded(2L) === ((64, 64)))
    assert(decoded(3L) === ((0, 0)), "corrupt image poison-pills, not throws")
  }

  test("pHash lane over REAL decoded pixels: JPEG re-encode is a 0-distance dup") {
    import spark.implicits._
    // four distinct patterns whose fingerprints share no band bucket,
    // plus a JPEG re-encode of pattern 0 — the only true near-dup
    val masks = Seq(0x1234, 0x00FF, 0xFF00, 0xAB12)
    val rows = masks.zipWithIndex.map { case (m, i) =>
      (i.toLong, "image/png", ImageIoCodec.encode(maskImage(m), "png"))
    } :+ ((100L, "image/jpeg", ImageIoCodec.encode(maskImage(masks.head), "jpg")))
    val assets = rows.toDF("asset_id", "modality", "bytes")
      .repartition(3) // decode must be partition-local, any layout
    val feats = Multimodal.realFeatures(assets)
    assert(feats.count() === 5, "all real assets decode")
    val pairs = Multimodal.phashPairs(feats, cap = 200)
      .select("a1", "a2", "d").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((0L, 100L, 0L)),
      s"exactly the PNG/JPEG twin pair at Hamming 0, got $pairs")
    graft.core.releaseQueryCaches(spark)
  }

  test("feature-ANN lane over REAL decoded pixels: the JPEG twin is the top hit") {
    import spark.implicits._
    val masks = Seq(0x1234, 0x00FF, 0xFF00, 0xAB12)
    val rows = masks.zipWithIndex.map { case (m, i) =>
      (i.toLong, "image/png", ImageIoCodec.encode(maskImage(m), "png"))
    } :+ ((100L, "image/jpeg", ImageIoCodec.encode(maskImage(masks.head), "jpg")))
    val feats = Multimodal.realFeatures(rows.toDF("asset_id", "modality", "bytes"))
    val top = Multimodal.cosineTopK(spark, feats, probeMax = 1, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top === Seq((0L, 100L)), "probe 0's nearest neighbour is its JPEG twin")
  }

  test("frame energies over real samples drive the VAD gate") {
    // 10 silent frames, 10 loud frames, 5 silent — the energy series
    // must gate exactly at the loud block (multimodal_audio_vad's shape)
    val silent = Array.fill[Short](256 * 10)(0)
    val loud = pcm(256 * 10, 20000, 37)
    val tail = Array.fill[Short](256 * 5)(0)
    val w = WavCodec.Wav(16000, 1, silent ++ loud ++ tail)
    val e = WavCodec.frameEnergies(w, 256)
    assert(e.length === 25)
    val speech = e.map(_ > 100.0)
    assert(speech.slice(0, 10).forall(!_), "silence must not gate as speech")
    assert(speech.slice(10, 20).forall(identity), "the loud block is speech")
    assert(speech.slice(20, 25).forall(!_))
  }
}
