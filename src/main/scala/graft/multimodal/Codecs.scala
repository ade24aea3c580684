package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** REAL media codecs: RIFF/WAVE PCM-16 audio and binary PPM (P6) images
  * parsed by hand, plus compressed images (JPEG/PNG/BMP/GIF and, on this
  * JDK, TIFF/WBMP) through `javax.imageio` — all pure-JVM, no native
  * libraries ([[ImageIoCodec]]). These are not stubs — the bytes are the
  * real wire formats, byte-for-byte readable by any standard tool — and
  * they plug into [[Multimodal.decodeWith]] unchanged, which is the
  * point: the dataflow around decode was always real, and for every
  * common training-image format plus PCM audio the decode kernel now is
  * too. Only compressed AUDIO/VIDEO codecs (Opus, H.264) remain
  * environment work: they genuinely need native libraries this container
  * does not ship, and they drop into the same `decodeWith` seam.
  *
  * Both decoders are TOTAL: any structural violation (bad magic, short
  * buffer, absurd declared sizes, truncated payload) returns None —
  * the poison-pill policy every parser in this codebase follows; a
  * corrupt asset must never throw into a partition iterator.
  */
object WavCodec {

  /** PCM-16 audio: interleaved samples, `channels` ≥ 1. */
  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
    def durationMs: Long =
      if (sampleRate <= 0) 0L else nFrames.toLong * 1000L / sampleRate
  }

  /** Canonical RIFF/WAVE encoding: RIFF(WAVE) + fmt(PCM16) + data. */
  def encode(w: Wav): Array[Byte] = {
    val dataLen = w.samples.length * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(US_ASCII))
    b.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(w.channels.toShort)
      .putInt(w.sampleRate)
      .putInt(w.sampleRate * w.channels * 2) // byte rate
      .putShort((w.channels * 2).toShort)    // block align
      .putShort(16)                          // bits per sample
    b.put("data".getBytes(US_ASCII)).putInt(dataLen)
    w.samples.foreach(b.putShort)
    b.array()
  }

  /** Total parse: walks RIFF sub-chunks (skipping unknown ones, like
    * LIST/INFO blocks real encoders emit), requires PCM-16, and reads
    * the data chunk. None on any malformation.
    */
  def decode(bytes: Array[Byte]): Option[Wav] =
    try {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); b.get(t); new String(t, US_ASCII)
      }
      if (tag() != "RIFF") return None
      b.getInt() // declared riff size — trust the buffer, not the field
      if (tag() != "WAVE") return None
      var rate = -1
      var channels = -1
      var samples: Array[Short] = null
      while (b.remaining() >= 8 && (samples == null || rate < 0)) {
        val id = tag()
        val len = b.getInt()
        if (len < 0 || len > b.remaining()) return None
        id match {
          case "fmt " =>
            if (len < 16) return None
            val fmtEnd = b.position() + len
            val audioFormat = b.getShort()
            channels = b.getShort().toInt
            rate = b.getInt()
            b.getInt(); b.getShort() // byte rate, block align
            val bits = b.getShort()
            if (audioFormat != 1 || bits != 16 || channels < 1 || rate <= 0) return None
            b.position(fmtEnd)
          case "data" =>
            if (len % 2 != 0) return None
            val out = new Array[Short](len / 2)
            var i = 0
            while (i < out.length) { out(i) = b.getShort(); i += 1 }
            samples = out
          case _ => // unknown chunk: skip (chunks are word-aligned)
            b.position(b.position() + len + (len & 1))
        }
      }
      if (rate > 0 && samples != null) Some(Wav(rate, channels, samples)) else None
    } catch { case _: Exception => None }

  /** Per-frame mean absolute amplitude — the energy series the VAD gate
    * consumes (multimodal_audio_vad's per-frame expression, now over
    * REAL samples). Channel-agnostic: frames are `frameLen` samples of
    * the interleaved stream.
    */
  def frameEnergies(w: Wav, frameLen: Int): Array[Double] =
    w.samples.grouped(frameLen).map { fr =>
      if (fr.isEmpty) 0.0
      else fr.map(s => math.abs(s.toInt).toDouble).sum / fr.length
    }.toArray
}

/** Binary PPM (P6) — the uncompressed RGB image container. */
object PpmCodec {

  final case class Ppm(width: Int, height: Int, maxVal: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3, "pixel buffer size mismatch")
  }

  def encode(p: Ppm): Array[Byte] = {
    val header = s"P6\n${p.width} ${p.height}\n${p.maxVal}\n".getBytes(US_ASCII)
    val out = new Array[Byte](header.length + p.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(p.pixels, 0, out, header.length, p.pixels.length)
    out
  }

  /** Total parse with the real grammar: whitespace-separated header
    * tokens, `#` comments allowed anywhere in the header, exactly one
    * whitespace byte after maxval, then width·height·3 raw bytes.
    */
  def decode(bytes: Array[Byte]): Option[Ppm] =
    try {
      var i = 0
      def peek: Int = if (i < bytes.length) bytes(i) & 0xff else -1
      def skipWs(): Unit = {
        var going = true
        while (going) {
          while (peek == ' ' || peek == '\n' || peek == '\r' || peek == '\t') i += 1
          if (peek == '#') { while (peek != '\n' && peek != -1) i += 1 }
          else going = false
        }
      }
      def token(): String = {
        skipWs()
        val start = i
        while (peek > ' ') i += 1
        new String(bytes, start, i - start, US_ASCII)
      }
      if (token() != "P6") return None
      val w = token().toInt
      val h = token().toInt
      val mx = token().toInt
      if (w <= 0 || h <= 0 || mx <= 0 || mx > 255) return None
      i += 1 // the single whitespace byte after maxval
      val need = w * h * 3
      if (bytes.length - i < need) return None
      val px = java.util.Arrays.copyOfRange(bytes, i, i + need)
      Some(Ppm(w, h, mx, px))
    } catch { case _: Exception => None }
}

/** Compressed images via `javax.imageio` — JPEG/PNG/BMP/GIF (+ TIFF/WBMP
  * on JDK 9+) decode is pure-JVM; no native libraries involved. Decoded
  * pixels normalize to the same interleaved-RGB buffer as [[PpmCodec]],
  * so everything downstream (grid features, pHash, ANN) is
  * container-agnostic. Total like the hand-written codecs: any
  * malformation (bad magic, truncated stream, zero-dim image) returns
  * None, never throws into a partition iterator.
  *
  * Codec-init amortization note for the partition seam: `ImageIO.read`
  * consults the static reader registry per call; scanning is
  * suppressed via `setUseCache(false)` (no temp-file spill) and the
  * registry lookup is in-memory — safe inside `mapPartitions` without
  * per-executor setup.
  */
object ImageIoCodec {

  javax.imageio.ImageIO.setUseCache(false) // decode in-memory, never spill

  /** Interleaved RGB, row-major — the PpmCodec pixel layout. */
  final case class Img(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3, "pixel buffer size mismatch")
  }

  def decode(bytes: Array[Byte]): Option[Img] =
    try {
      if (bytes == null || bytes.length == 0) return None
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (bi == null || bi.getWidth <= 0 || bi.getHeight <= 0) None
      else {
        val w = bi.getWidth
        val h = bi.getHeight
        // bulk ARGB fetch (one call, not w·h getRGB round-trips), then
        // strip alpha into the interleaved-RGB layout
        val argb = bi.getRGB(0, 0, w, h, null, 0, w)
        val px = new Array[Byte](w * h * 3)
        var i = 0
        var o = 0
        while (i < argb.length) {
          val v = argb(i)
          px(o) = ((v >> 16) & 0xff).toByte
          px(o + 1) = ((v >> 8) & 0xff).toByte
          px(o + 2) = (v & 0xff).toByte
          i += 1
          o += 3
        }
        Some(Img(w, h, px))
      }
    } catch { case _: Exception => None }

  /** Encode to a named ImageIO format ("png", "jpg", "bmp", "gif") —
    * fixture construction for tests and the write half of a transcode
    * stage. PNG/BMP are lossless (decode∘encode = identity on RGB);
    * JPEG is lossy by design.
    */
  def encode(img: Img, format: String): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val argb = new Array[Int](img.width * img.height)
    var i = 0
    var o = 0
    while (i < argb.length) {
      argb(i) = ((img.pixels(o) & 0xff) << 16) |
        ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff)
      i += 1
      o += 3
    }
    bi.setRGB(0, 0, img.width, img.height, argb, 0, img.width)
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(bi, format, bos))
      throw new IllegalArgumentException(s"no ImageIO writer for '$format'")
    bos.toByteArray
  }

  /** `grid`×`grid` mean-luma features in [0,1] — the pixel-derived
    * feature vector the pHash and feature-ANN lanes consume (a real
    * vision encoder drops into the same Array[Float] contract). Cells
    * partition the image by integer bounds, so every pixel contributes
    * to exactly one cell at any resolution.
    */
  def gridFeatures(img: Img, grid: Int = 4): Array[Float] = {
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < img.height) {
      val cy = y * grid / img.height
      var x = 0
      while (x < img.width) {
        val cx = x * grid / img.width
        val o = (y * img.width + x) * 3
        // integer ITU-R 601 luma (77R + 150G + 29B) >> 8 — deterministic
        val luma = ((img.pixels(o) & 0xff) * 77 +
          (img.pixels(o + 1) & 0xff) * 150 + (img.pixels(o + 2) & 0xff) * 29) >> 8
        val c = cy * grid + cx
        sums(c) += luma
        counts(c) += 1L
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid)(c =>
      if (counts(c) == 0L) 0f else (sums(c) / counts(c) / 255.0).toFloat)
  }
}
