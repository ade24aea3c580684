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
