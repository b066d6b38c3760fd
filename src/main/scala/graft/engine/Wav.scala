package graft.engine

import java.io.ByteArrayOutputStream

/** Pure-JVM RIFF/WAV codec — the audio sibling of [[Png]]: a real
  * container walk (RIFF framing, word alignment, fmt field parse, PCM
  * sample readback) with zero external libraries. Scope is canonical
  * PCM16 mono and stereo (interleaved); the decoder validates the
  * framing it relies on and fails loudly on corruption.
  */
object Wav {

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte)
  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode PCM16 mono at 8 kHz; `sample(i)` supplies the i-th sample
    * (clamped int16 range expected). */
  def encodePcm16(n: Int, sample: Int => Int): Array[Byte] = {
    require(n > 0, "need at least one sample")
    val out = new ByteArrayOutputStream(44 + 2 * n)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + 2 * n))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1))            // PCM
    out.write(le16(1))            // mono
    out.write(le32(8000))         // sample rate
    out.write(le32(8000 * 2))     // byte rate
    out.write(le16(2))            // block align
    out.write(le16(16))           // bits per sample
    out.write("data".getBytes("US-ASCII")); out.write(le32(2 * n))
    var i = 0
    while (i < n) { out.write(le16(sample(i) & 0xffff)); i += 1 }
    out.toByteArray
  }

  /** Encode PCM16 STEREO at 8 kHz: n frames, `left`/`right` supply
    * the per-channel samples; the data chunk interleaves L R L R …
    * (the canonical WAV channel layout). */
  def encodePcm16Stereo(n: Int, left: Int => Int,
                        right: Int => Int): Array[Byte] = {
    require(n > 0, "need at least one frame")
    val out = new ByteArrayOutputStream(44 + 4 * n)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + 4 * n))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1))            // PCM
    out.write(le16(2))            // stereo
    out.write(le32(8000))         // sample rate
    out.write(le32(8000 * 4))     // byte rate
    out.write(le16(4))            // block align
    out.write(le16(16))           // bits per sample
    out.write("data".getBytes("US-ASCII")); out.write(le32(4 * n))
    var i = 0
    while (i < n) {
      out.write(le16(left(i) & 0xffff))
      out.write(le16(right(i) & 0xffff))
      i += 1
    }
    out.toByteArray
  }

  final case class Meta(audioFormat: Long, channels: Long, sampleRate: Long,
                        bitsPerSample: Long, nChunks: Long, nSamples: Long,
                        sumAbs: Long)

  /** Full decode: RIFF/WAVE framing, sub-chunk walk with word
    * alignment, fmt field extraction, PCM16 sample readback with an
    * exact integer digest (Σ|sample| over every channel). nSamples is
    * the FRAME count (per-channel). Throws on truncation or
    * non-PCM16 content; 1 or 2 channels. */
  def decodePcm16(bytes: Array[Byte]): Meta = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    require(readLe32(bytes, 4) == bytes.length - 8,
      s"RIFF size ${readLe32(bytes, 4)} != ${bytes.length - 8}")
    var off = 12
    var nChunks = 0L
    var fmt = -1; var channels = -1; var rate = -1; var bits = -1
    var nSamples = 0L; var sumAbs = 0L
    while (off < bytes.length) {
      require(off + 8 <= bytes.length, "truncated chunk header")
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = readLe32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, s"truncated $id chunk")
      id match {
        case "fmt " =>
          require(len >= 16, "short fmt chunk")
          fmt = readLe16(bytes, off + 8)
          channels = readLe16(bytes, off + 10)
          rate = readLe32(bytes, off + 12)
          bits = readLe16(bytes, off + 22)
        case "data" =>
          require(fmt == 1 && (channels == 1 || channels == 2) &&
              bits == 16,
            s"decoder scope is PCM16 mono/stereo " +
              s"(fmt=$fmt ch=$channels bits=$bits)")
          require(len % (2 * channels) == 0,
            "PCM16 data length not frame-aligned")
          nSamples = len / 2 / channels // FRAMES (per-channel count)
          var i = off + 8
          val end = off + 8 + len
          while (i < end) {
            sumAbs += math.abs(readLe16(bytes, i).toShort.toLong)
            i += 2
          }
        case _ => () // ancillary chunks: counted, skipped
      }
      nChunks += 1
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(nSamples > 0, "no data chunk")
    Meta(fmt, channels, rate, bits, nChunks, nSamples, sumAbs)
  }

  /** Sample readback for feature extraction: validates through the
    * full [[decodePcm16]] walk FIRST (RIFF size, chunk bounds, PCM16
    * scope — an 8-bit/float file must fail loudly, never be silently
    * misread as int16), then re-walks for the samples themselves.
    * Stereo streams return the raw INTERLEAVED order (L R L R …);
    * [[deinterleave]] splits channels. */
  def decodePcm16Samples(bytes: Array[Byte]): Array[Int] = {
    decodePcm16(bytes) // full validation; throws on anything off-scope
    var off = 12
    var out: Array[Int] = null
    while (off < bytes.length && out == null) {
      require(off + 8 <= bytes.length, "truncated chunk header")
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = readLe32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, s"truncated $id chunk")
      if (id == "data") {
        require(len % 2 == 0, "odd PCM16 data length")
        out = new Array[Int](len / 2)
        var i = 0
        while (i < out.length) {
          out(i) = readLe16(bytes, off + 8 + 2 * i).toShort.toInt
          i += 1
        }
      }
      off += 8 + len + (len & 1)
    }
    require(out != null, "no data chunk")
    out
  }

  /** Split an interleaved multi-channel sample array into per-channel
    * arrays (frame-major interleave, the WAV layout). */
  def deinterleave(samples: Array[Int],
                   channels: Int): Array[Array[Int]] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"cannot split ${samples.length} samples into $channels channels")
    val frames = samples.length / channels
    Array.tabulate(channels)(c =>
      Array.tabulate(frames)(f => samples(f * channels + c)))
  }
}
