package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** REAL media codecs for the uncompressed container formats a pure JVM
  * can parse without native libraries: RIFF/WAVE PCM-16 audio and
  * binary PPM (P6) images. These are not stubs — the bytes are the real
  * wire formats, byte-for-byte readable by any standard tool — and they
  * plug into [[Multimodal.decodeWith]] unchanged, which is the point:
  * the dataflow around decode was always real, and for uncompressed
  * formats the decode kernel now is too. Compressed codecs (JPEG,
  * Opus, H.264) remain environment work: they need native libraries
  * this container does not ship, and they drop into the same
  * `decodeWith` seam.
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
