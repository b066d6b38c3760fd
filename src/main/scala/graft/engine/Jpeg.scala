package graft.engine

import java.io.ByteArrayOutputStream

/** Pure-JVM baseline-sequential JPEG (JFIF) codec — the third leg of
  * the multimodal decode family (PNG: chunk walk + inflate; WAV: RIFF
  * walk; JPEG: entropy decode + IDCT), closing the "real crawls are
  * mostly JPEG" gap (r9 verdict #5) and, since round 11, the
  * grayscale-only gap (r10 verdict #6): both 8-bit grayscale and
  * 3-component 4:2:0 YCbCr baseline streams decode. Everything here
  * is public T.81/JFIF structure: marker segments (SOI/APP0/DQT/SOF0/
  * DHT/SOS/EOI), the Annex K.1/K.2 quantization tables, Annex K.3
  * typical Huffman tables, canonical code construction from
  * BITS/HUFFVAL, byte stuffing (FF 00), per-component DC prediction,
  * run/size AC coding with EOB/ZRL, zigzag ordering, MCU-interleaved
  * scans with 2x2/1x1/1x1 sampling (T.81 A.2), restart intervals
  * (DRI/RSTn with prediction reset), and a double-precision IDCT.
  *
  * The encoders are the fixture half (the Png.encodeGray8 posture):
  * they emit spec-complete baseline streams for arbitrary images. The
  * decoder is the codec under test: a full baseline entropy decoder
  * (any run/size AC layout, restart-free scans, tables taken from the
  * stream's own DQT/DHT segments — not assumed) — not just the
  * inverse of what the encoders happen to emit. JPEG is lossy in
  * general; the multimodal_decode_jpeg fixtures feed blocks whose DCT
  * is DC-only with exactly-quantizable DC (uniform luma blocks of
  * even value; uniform chroma blocks at 128 + 17t, since the K.2
  * table's Q(0,0) = 17), so the decoded image is bit-exact and the
  * DuckDB oracle can restate it in closed form — agreement proves the
  * marker walk, Huffman decode, dequant, MCU raster, and IDCT
  * end-to-end.
  *
  * Untrusted-byte contract (fuzz-pinned): any input either decodes or
  * throws IllegalArgumentException — every segment field read is
  * bounded by BOTH the segment's declared length and the stream
  * length, and standalone markers (TEM, RSTn, premature EOI) before
  * SOS are handled explicitly instead of misreading payload bytes as
  * a length.
  */
object Jpeg {

  /** Annex K.1 luminance quantization table, natural (row-major)
    * order. Q(0,0) = 16 is what makes the luma fixture's DC exactly
    * quantizable: DC = 8·(v−128) with v even divides evenly. */
  val QuantLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table, natural order.
    * Q(0,0) = 17: a uniform chroma block at 128 + 17t has DC = 8·17t,
    * exactly quantizable — the color fixture's closed-form hook. */
  val QuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag scan order: ZigZag(k) = natural index of the k-th
    * coefficient in scan order. */
  val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 typical DC luminance table: BITS then HUFFVAL. */
  val DcBits: Array[Int] =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcVals: Array[Int] = (0 to 11).toArray

  /** Annex K.3.2 typical AC luminance table. */
  val AcBits: Array[Int] =
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Annex K.3.1 typical DC chrominance table. */
  val DcBitsC: Array[Int] =
    Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  val DcValsC: Array[Int] = (0 to 11).toArray

  /** Annex K.3.2 typical AC chrominance table. (The decoder takes its
    * tables from the stream's DHT segments, so these are the ENCODER's
    * fixture tables — any self-consistent canonical table works; these
    * follow the published typical tables.) */
  val AcBitsC: Array[Int] =
    Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  val AcValsC: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** AC table for PROGRESSIVE scans. The sequential typical table
    * (K.3.2) has no codewords for the EOBn run codes 0x10..0xE0
    * (T.81 G.1.2.2 — eob runs of 2..2^14 blocks) and leaves exactly
    * ONE unused length-16 code, so they cannot be appended to it
    * (the canonical code space would overflow into >16-bit codes).
    * Instead progressive scans use a flat all-8-bit canonical table
    * over every symbol they can emit — EOB0..EOB14, ZRL, and
    * run/size (r ≤ 15, s ≤ 10): 176 codewords ≤ 2^8, Kraft-valid by
    * construction. Suboptimal compression, irrelevant for fixtures;
    * the decoder takes whatever table the stream's DHT declares. */
  val AcValsProg: Array[Int] =
    ((0 to 14).map(_ << 4) ++ Seq(0xf0) ++
      (for { r <- 0 to 15; s <- 1 to 10 } yield (r << 4) | s)).toArray
  val AcBitsProg: Array[Int] = {
    val b = new Array[Int](17); b(8) = AcValsProg.length; b
  }

  /** Canonical Huffman codes from BITS/HUFFVAL (T.81 C.2): returns
    * value → (code, length). */
  private def buildEncodeTable(bits: Array[Int],
                               vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        out += vals(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Decode table: MINCODE/MAXCODE/VALPTR per length (T.81 F.2.2.3). */
  private final class DecodeTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len)
        k += bits(len)
        maxCode(len) = if (bits(len) > 0) code - 1 else -1
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len))
  }

  /** cos((2x+1)·u·π/16) lookup — the DCT basis evaluated once; the
    * per-block loops below would otherwise call math.cos 8k times
    * per block (measured: the whole key drops ~2× with the table). */
  private val CosTab: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))

  private final class BitWriter {
    val out = new ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = {
      // pad the final byte with 1-bits (T.81 F.1.2.3)
      if (nBits > 0) {
        acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
        out.write(acc & 0xff)
        if ((acc & 0xff) == 0xff) out.write(0x00)
        acc = 0; nBits = 0
      }
    }
    /** Byte-align and emit RSTm (T.81 E.1.4: restart markers sit
      * between byte-aligned entropy segments, unstuffed). */
    def restart(m: Int): Unit = {
      flush()
      out.write(0xff)
      out.write(0xd0 + (m & 7))
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    /** Consume a byte-aligned RSTm marker (T.81 F.2.1.3.1): discard
      * the partial byte, require exactly FF D0+expected. */
    def expectRestart(expected: Int): Unit = {
      nBits = 0 // drop pad bits — restart markers are byte-aligned
      require(pos + 2 <= data.length, "jpeg: truncated at restart marker")
      val b0 = data(pos) & 0xff
      val b1 = data(pos + 1) & 0xff
      require(b0 == 0xff && b1 == 0xd0 + (expected & 7),
        f"jpeg: expected RST${expected & 7} at restart boundary, " +
          f"found $b0%02X$b1%02X (corrupt or missing restart marker)")
      pos += 2
    }
    def bit(): Int = {
      if (nBits == 0) {
        require(pos < data.length, "jpeg: entropy stream truncated")
        val b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < data.length, "jpeg: dangling FF in entropy stream")
          val m = data(pos) & 0xff
          require(m == 0x00, f"jpeg: unexpected marker FF$m%02X mid-scan")
          pos += 1
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** Magnitude category (number of bits) of a coefficient. */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** EXTEND (T.81 F.2.2.1): map s raw bits back to a signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0
    else if (v < (1 << (s - 1))) v - (1 << s) + 1
    else v

  /** IDCT + level shift + clamp of one DEQUANTIZED natural-order 8×8
    * block into a padded component buffer at (ox, oy). */
  private def idctBlock(coef: Array[Int], buf: Array[Byte], w: Int,
                        ox: Int, oy: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cc = coef(u * 8 + v)
            if (cc != 0) {
              val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
              val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
              sum += cu * cv * cc * CosTab(x)(v) * CosTab(y)(u)
            }
            v += 1
          }
          u += 1
        }
        val s = math.round(0.25 * sum + 128).toInt
        buf((oy + y) * w + ox + x) =
          math.max(0, math.min(255, s)).toByte
        x += 1
      }
      y += 1
    }
  }

  // ---------------------------------------------------------------
  // Encoders
  // ---------------------------------------------------------------

  /** Forward-DCT + quantize one level-shifted 8×8 block sampled via
    * `sample(x, y)` (block-local coordinates) → 64 quantized
    * coefficients in natural order. SEPARABLE DCT: rows then
    * columns — 2·8·8·8 mult-adds per block instead of the direct
    * form's 64·64 (measured: the color decode key drops ~3×; fp
    * summation order changes only the ~1e-12 tail, far inside the
    * quantizer's rounding). */
  private def quantBlock(sample: (Int, Int) => Int,
                         quant: Array[Int]): Array[Int] = {
    val coef = new Array[Int](64)
    val px = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) { px(y * 8 + x) = sample(x, y) - 128.0; x += 1 }
      y += 1
    }
    val tmp = new Array[Double](64) // tmp(y*8+v) = Σ_x px(y,x)·cos(x,v)
    y = 0
    while (y < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += px(y * 8 + x) * CosTab(x)(v); x += 1 }
        tmp(y * 8 + v) = s
        v += 1
      }
      y += 1
    }
    val isq2 = 1.0 / math.sqrt(2)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + v) * CosTab(yy)(u); yy += 1 }
        val cu = if (u == 0) isq2 else 1.0
        val cv = if (v == 0) isq2 else 1.0
        coef(u * 8 + v) =
          math.round(0.25 * cu * cv * s / quant(u * 8 + v)).toInt
        v += 1
      }
      u += 1
    }
    coef
  }

  /** Forward-DCT, quantize, and entropy-code one level-shifted 8×8
    * block sampled via `sample(x, y)` (block-local coordinates);
    * returns the new DC predictor. */
  private def encodeBlock(bw: BitWriter, sample: (Int, Int) => Int,
                          quant: Array[Int],
                          dcEnc: Map[Int, (Int, Int)],
                          acEnc: Map[Int, (Int, Int)], pred: Int): Int = {
    val coef = quantBlock(sample, quant)
    // DC: differential, category + raw bits
    val diff = coef(0) - pred
    val s0 = category(diff)
    val (c0, l0) = dcEnc(s0)
    bw.put(c0, l0)
    if (s0 > 0)
      bw.put(if (diff >= 0) diff else diff + (1 << s0) - 1, s0)
    // AC: run/size with ZRL and EOB
    var run = 0
    var kk = 1
    while (kk < 64) {
      val ac = coef(ZigZag(kk))
      if (ac == 0) run += 1
      else {
        while (run > 15) {
          val (cz, lz) = acEnc(0xf0); bw.put(cz, lz); run -= 16
        }
        val sa = category(ac)
        val (ca, la) = acEnc((run << 4) | sa)
        bw.put(ca, la)
        bw.put(if (ac >= 0) ac else ac + (1 << sa) - 1, sa)
        run = 0
      }
      kk += 1
    }
    if (run > 0) { val (ce, le) = acEnc(0x00); bw.put(ce, le) }
    coef(0)
  }

  /** Encode an 8-bit grayscale image as baseline JFIF. `pixel(x, y)`
    * supplies values 0..255; dimensions need not be block-aligned
    * (edge blocks replicate the border sample, the standard pad).
    * `restartInterval` > 0 emits a DRI segment and an RSTn marker
    * (with DC-prediction reset) after every that-many MCUs — the
    * camera-JPEG framing that bounds error propagation; it changes
    * the stream layout, never the decoded pixels. */
  def encodeGray8(width: Int, height: Int,
                  pixel: (Int, Int) => Int,
                  restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg: empty image")
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF
    u16(16); out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1) // version 1.1
    u8(0); u16(1); u16(1) // no units, 1:1 aspect
    u8(0); u8(0) // no thumbnail
    marker(0xdb) // DQT
    u16(2 + 1 + 64)
    u8(0x00) // 8-bit precision, table 0
    var k = 0
    while (k < 64) { u8(QuantLum(ZigZag(k))); k += 1 } // zigzag order
    marker(0xc0) // SOF0: baseline, 8-bit, 1 component, no subsampling
    u16(8 + 3 * 1)
    u8(8); u16(height); u16(width); u8(1)
    u8(1); u8(0x11); u8(0) // component 1, 1x1 sampling, qtable 0
    marker(0xc4) // DHT: DC table 0
    u16(2 + 1 + 16 + DcVals.length)
    u8(0x00)
    for (i <- 1 to 16) u8(DcBits(i))
    DcVals.foreach(u8)
    marker(0xc4) // DHT: AC table 0
    u16(2 + 1 + 16 + AcVals.length)
    u8(0x10)
    for (i <- 1 to 16) u8(AcBits(i))
    AcVals.foreach(u8)
    if (restartInterval > 0) {
      marker(0xdd) // DRI
      u16(4); u16(restartInterval)
    }
    marker(0xda) // SOS
    u16(6 + 2 * 1)
    u8(1); u8(1); u8(0x00) // component 1 uses DC 0 / AC 0
    u8(0); u8(63); u8(0) // full spectral selection, no approximation

    val dcEnc = buildEncodeTable(DcBits, DcVals)
    val acEnc = buildEncodeTable(AcBits, AcVals)
    val bw = new BitWriter
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val nMcus = blocksX * blocksY
    var pred = 0
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        pred = encodeBlock(bw,
          (x, y) => pixel(math.min(bx * 8 + x, width - 1),
                          math.min(by * 8 + y, height - 1)),
          QuantLum, dcEnc, acEnc, pred)
        mcu += 1
        if (restartInterval > 0 && mcu % restartInterval == 0 &&
            mcu < nMcus) {
          bw.restart(rst); rst = (rst + 1) % 8; pred = 0
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(bw.out.toByteArray)
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Progressive encoder (T.81 Annex G) — the fixture half for
  // multimodal_decode_jpeg_progressive and the JpegSpec parity tests.
  // ---------------------------------------------------------------

  /** AC point transform (G.1.2.2): division by 2^Al truncating toward
    * ZERO — not an arithmetic shift, which floors. */
  private def ptAc(v: Int, al: Int): Int =
    if (v >= 0) v >> al else -((-v) >> al)

  /** One AC FIRST scan (Ah = 0) over `blocks` for band [ss, se] at
    * approximation Al: run/size over the point-transformed values,
    * EOBn run codes across all-zero band tails. */
  private def encodeAcFirst(bw: BitWriter, blocks: Array[Array[Int]],
                            ss: Int, se: Int, al: Int,
                            acEnc: Map[Int, (Int, Int)],
                            restartInterval: Int = 0): Unit = {
    var eobrun = 0
    var rstIdx = 0
    def flushEob(): Unit = if (eobrun > 0) {
      val n = 31 - Integer.numberOfLeadingZeros(eobrun)
      val (c, l) = acEnc(n << 4)
      bw.put(c, l)
      if (n > 0) bw.put(eobrun - (1 << n), n)
      eobrun = 0
    }
    var bi = 0
    while (bi < blocks.length) {
      if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
        flushEob() // a pending EOB run may not cross a restart boundary
        bw.restart(rstIdx)
        rstIdx = (rstIdx + 1) % 8
      }
      val coef = blocks(bi)
      var r = 0
      var k = ss
      while (k <= se) {
        val v = ptAc(coef(ZigZag(k)), al)
        if (v == 0) r += 1
        else {
          flushEob()
          while (r > 15) {
            val (cz, lz) = acEnc(0xf0); bw.put(cz, lz); r -= 16
          }
          val s = category(v)
          val (ca, la) = acEnc((r << 4) | s)
          bw.put(ca, la)
          bw.put(if (v >= 0) v else v + (1 << s) - 1, s)
          r = 0
        }
        k += 1
      }
      if (r > 0) { eobrun += 1; if (eobrun == 0x7fff) flushEob() }
      bi += 1
    }
    flushEob()
  }

  /** One AC REFINEMENT scan (Ah = Al + 1) over `blocks` for band
    * [ss, se]: newly-significant coefficients code as run/1 + sign,
    * already-nonzero coefficients contribute one buffered correction
    * bit each, EOB runs carry their blocks' buffered bits (T.81
    * G.1.2.3 — the two-buffer structure: a global buffer for bits
    * owed by EOB-run blocks, a per-block buffer flushed after each
    * emitted symbol). */
  private def encodeAcRefine(bw: BitWriter, blocks: Array[Array[Int]],
                             ss: Int, se: Int, al: Int,
                             acEnc: Map[Int, (Int, Int)],
                             restartInterval: Int = 0): Unit = {
    var eobrun = 0
    var rstIdx = 0
    val be = scala.collection.mutable.ArrayBuffer.empty[Int]
    def flushEob(): Unit = {
      if (eobrun > 0) {
        val n = 31 - Integer.numberOfLeadingZeros(eobrun)
        val (c, l) = acEnc(n << 4)
        bw.put(c, l)
        if (n > 0) bw.put(eobrun - (1 << n), n)
        eobrun = 0
      }
      be.foreach(bw.put(_, 1))
      be.clear()
    }
    var bi = 0
    while (bi < blocks.length) {
      if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
        flushEob() // EOB runs and buffered bits may not cross restarts
        bw.restart(rstIdx)
        rstIdx = (rstIdx + 1) % 8
      }
      val coef = blocks(bi)
      val absv = new Array[Int](se + 1)
      var eobPos = ss - 1 // last newly-significant index in this block
      var k = ss
      while (k <= se) {
        val a = math.abs(coef(ZigZag(k))) >> al
        absv(k) = a
        if (a == 1) eobPos = k
        k += 1
      }
      var r = 0
      val br = scala.collection.mutable.ArrayBuffer.empty[Int]
      k = ss
      while (k <= se) {
        val a = absv(k)
        if (a == 0) r += 1
        else {
          while (r > 15 && k <= eobPos) {
            flushEob()
            val (cz, lz) = acEnc(0xf0); bw.put(cz, lz); r -= 16
            br.foreach(bw.put(_, 1)); br.clear()
          }
          if (a > 1) br += (a & 1)
          else {
            flushEob()
            val (ca, la) = acEnc((r << 4) | 1)
            bw.put(ca, la)
            bw.put(if (coef(ZigZag(k)) >= 0) 1 else 0, 1)
            br.foreach(bw.put(_, 1)); br.clear()
            r = 0
          }
        }
        k += 1
      }
      if (r > 0 || br.nonEmpty) {
        eobrun += 1
        be ++= br
        if (eobrun == 0x7fff) flushEob()
      }
      bi += 1
    }
    flushEob()
  }

  /** Encode an 8-bit grayscale image as PROGRESSIVE JFIF (SOF2,
    * T.81 Annex G): six scans exercising both progressive modes —
    * spectral selection (DC, AC 1–5, AC 6–63 as separate scans) and
    * successive approximation (every band sends its high bits first
    * at Al=1, then a refinement scan at Al=0). Decoding all scans
    * reconstructs the EXACT quantized coefficients of the baseline
    * encoding, so `decode` of this stream equals `decode` of
    * `encodeGray8` of the same image bit-for-bit (JpegSpec parity).
    * Same border-replicating block pad as the baseline encoder. */
  def encodeGray8Progressive(width: Int, height: Int,
                             pixel: (Int, Int) => Int,
                             restartInterval: Int = 0): Array[Byte] =
    encodeGray8ProgressiveScans(width, height, pixel, Seq(
      (0, 0, 0, 1), (1, 5, 0, 1), (6, 63, 0, 1),
      (0, 0, 1, 0), (1, 5, 1, 0), (6, 63, 1, 0)), restartInterval)

  /** Progressive encode with an explicit scan plan (Ss, Se, Ah, Al)
    * — exposed for spec-level bisection of the scan machinery; the
    * public entry uses the canonical six-scan plan. The plan must
    * follow G.1.1.1: DC first scan precedes AC scans; each band's
    * first scan precedes its refinements; refinements step Al down
    * by one. */
  private[graft] def encodeGray8ProgressiveScans(
      width: Int, height: Int, pixel: (Int, Int) => Int,
      plan: Seq[(Int, Int, Int, Int)],
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg: empty image")
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val blocks = Array.tabulate(blocksY * blocksX) { bi =>
      val bx = bi % blocksX
      val by = bi / blocksX
      quantBlock((x, y) => pixel(math.min(bx * 8 + x, width - 1),
                                 math.min(by * 8 + y, height - 1)),
        QuantLum)
    }
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF
    u16(16); out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb) // DQT
    u16(2 + 1 + 64); u8(0x00)
    var k = 0
    while (k < 64) { u8(QuantLum(ZigZag(k))); k += 1 }
    marker(0xc2) // SOF2: progressive, 8-bit, 1 component
    u16(8 + 3)
    u8(8); u16(height); u16(width); u8(1)
    u8(1); u8(0x11); u8(0)
    marker(0xc4) // DHT: DC table 0
    u16(2 + 1 + 16 + DcVals.length); u8(0x00)
    for (i <- 1 to 16) u8(DcBits(i))
    DcVals.foreach(u8)
    marker(0xc4) // DHT: AC table 0 (progressive: includes EOBn codes)
    u16(2 + 1 + 16 + AcValsProg.length); u8(0x10)
    for (i <- 1 to 16) u8(AcBitsProg(i))
    AcValsProg.foreach(u8)

    if (restartInterval > 0) {
      marker(0xdd) // DRI
      u16(4); u16(restartInterval)
    }
    val dcEnc = buildEncodeTable(DcBits, DcVals)
    val acEnc = buildEncodeTable(AcBitsProg, AcValsProg)
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda)
      u16(6 + 2); u8(1); u8(1); u8(0x00)
      u8(ss); u8(se); u8((ah << 4) | al)
    }
    plan.foreach { case (ss, se, ah, al) =>
      sos(ss, se, ah, al)
      val bw = new BitWriter
      if (ss == 0 && ah == 0) {
        // DC first: differential high bits (the DC point transform is
        // an ARITHMETIC shift, G.1.2.1)
        var pred = 0
        var rstIdx = 0
        blocks.zipWithIndex.foreach { case (coef, bi) =>
          if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
            bw.restart(rstIdx)
            rstIdx = (rstIdx + 1) % 8
            pred = 0 // prediction resets at restart boundaries
          }
          val v = coef(0) >> al
          val diff = v - pred
          pred = v
          val s = category(diff)
          val (c, l) = dcEnc(s)
          bw.put(c, l)
          if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        }
      } else if (ss == 0) {
        // DC refinement: one raw bit per block (byte-aligned restarts
        // still punctuate the stream)
        var rstIdx = 0
        blocks.zipWithIndex.foreach { case (coef, bi) =>
          if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
            bw.restart(rstIdx)
            rstIdx = (rstIdx + 1) % 8
          }
          bw.put((coef(0) >> al) & 1, 1)
        }
      } else if (ah == 0)
        encodeAcFirst(bw, blocks, ss, se, al, acEnc, restartInterval)
      else encodeAcRefine(bw, blocks, ss, se, al, acEnc, restartInterval)
      bw.flush(); out.write(bw.out.toByteArray)
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a 4:2:0 YCbCr image as PROGRESSIVE JFIF — the
    * multi-component Annex G shape: one INTERLEAVED DC first scan
    * (MCU walk, per-component prediction, Al=1), an interleaved DC
    * refinement, then per-component AC first + refinement scans over
    * each component's own (non-interleaved) block raster — AC scans
    * in progressive frames are single-component by definition
    * (G.1.1). Decoding reconstructs the exact quantized coefficients
    * of `encodeColor420`, so the two decodes agree bit-for-bit per
    * plane (JpegSpec parity). */
  def encodeColor420Progressive(width: Int, height: Int,
                                y: (Int, Int) => Int,
                                cb: (Int, Int) => Int,
                                cr: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg: empty image")
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    val mcusX = (width + 15) / 16
    val mcusY = (height + 15) / 16
    // padded per-component quantized coefficient grids (the DC
    // interleaved walk covers MCU-pad blocks; AC walks cover only the
    // component's own raster — pad blocks stay DC-only, cropped away)
    def grid(wB: Int, hB: Int, quant: Array[Int],
             sample: (Int, Int) => Int): Array[Array[Int]] =
      Array.tabulate(hB * wB) { bi =>
        val bx = bi % wB
        val by = bi / wB
        quantBlock((x, yy) => sample(bx * 8 + x, by * 8 + yy), quant)
      }
    val yBlocks = grid(mcusX * 2, mcusY * 2, QuantLum,
      (x, yy) => y(math.min(x, width - 1), math.min(yy, height - 1)))
    val cbBlocks = grid(mcusX, mcusY, QuantChroma,
      (x, yy) => cb(math.min(x, cw - 1), math.min(yy, ch - 1)))
    val crBlocks = grid(mcusX, mcusY, QuantChroma,
      (x, yy) => cr(math.min(x, cw - 1), math.min(yy, ch - 1)))

    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    def dqt(id: Int, t: Array[Int]): Unit = {
      marker(0xdb); u16(2 + 1 + 64); u8(id)
      var k = 0
      while (k < 64) { u8(t(ZigZag(k))); k += 1 }
    }
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((cls << 4) | id)
      for (i <- 1 to 16) u8(bits(i))
      vals.foreach(u8)
    }
    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF
    u16(16); out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    dqt(0, QuantLum)
    dqt(1, QuantChroma)
    marker(0xc2) // SOF2: progressive, 8-bit, 3 components, 4:2:0
    u16(8 + 3 * 3)
    u8(8); u16(height); u16(width); u8(3)
    u8(1); u8(0x22); u8(0)
    u8(2); u8(0x11); u8(1)
    u8(3); u8(0x11); u8(1)
    dht(0, 0, DcBits, DcVals)
    dht(0, 1, DcBitsC, DcValsC)
    dht(1, 0, AcBitsProg, AcValsProg) // both components' AC scans
    val dcEncY = buildEncodeTable(DcBits, DcVals)
    val dcEncC = buildEncodeTable(DcBitsC, DcValsC)
    val acEnc = buildEncodeTable(AcBitsProg, AcValsProg)

    def sos(comps: Seq[(Int, Int, Int)], ss: Int, se: Int,
            ah: Int, al: Int): Unit = {
      marker(0xda)
      u16(6 + 2 * comps.length); u8(comps.length)
      comps.foreach { case (id, dcSel, acSel) =>
        u8(id); u8((dcSel << 4) | acSel)
      }
      u8(ss); u8(se); u8((ah << 4) | al)
    }
    // the interleaved MCU walk's per-block visit order: Y 2×2, Cb, Cr
    def mcuWalk(visit: (Int /*comp*/, Array[Int] /*coef*/) => Unit): Unit = {
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var vb = 0
          while (vb < 2) {
            var hb = 0
            while (hb < 2) {
              visit(0, yBlocks((my * 2 + vb) * (mcusX * 2) + mx * 2 + hb))
              hb += 1
            }
            vb += 1
          }
          visit(1, cbBlocks(my * mcusX + mx))
          visit(2, crBlocks(my * mcusX + mx))
          mx += 1
        }
        my += 1
      }
    }
    val allComps = Seq((1, 0, 0), (2, 1, 0), (3, 1, 0))
    // Scan 1 — interleaved DC first at Al=1
    sos(allComps, 0, 0, 0, 1)
    locally {
      val bw = new BitWriter
      val preds = new Array[Int](3)
      mcuWalk { (ci, coef) =>
        val v = coef(0) >> 1
        val diff = v - preds(ci)
        preds(ci) = v
        val s = category(diff)
        val (c, l) = (if (ci == 0) dcEncY else dcEncC)(s)
        bw.put(c, l)
        if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      }
      bw.flush(); out.write(bw.out.toByteArray)
    }
    // Scans 2–7 — per-component AC first at Al=1 over the component's
    // own block raster (nbx × nby inside the padded grid)
    def compRaster(ci: Int): Array[Array[Int]] = {
      val (blocks, wB, pw, ph) = ci match {
        case 0 => (yBlocks, mcusX * 2, width, height)
        case 1 => (cbBlocks, mcusX, cw, ch)
        case _ => (crBlocks, mcusX, cw, ch)
      }
      val nbx = (pw + 7) / 8
      val nby = (ph + 7) / 8
      Array.tabulate(nby * nbx) { bi =>
        blocks((bi / nbx) * wB + bi % nbx)
      }
    }
    val compIds = Seq((1, 0, 0), (2, 1, 0), (3, 1, 0))
    compIds.zipWithIndex.foreach { case (cid, ci) =>
      sos(Seq(cid), 1, 63, 0, 1)
      val bw = new BitWriter
      encodeAcFirst(bw, compRaster(ci), 1, 63, 1, acEnc)
      bw.flush(); out.write(bw.out.toByteArray)
    }
    // Scan — interleaved DC refinement (one raw bit per block)
    sos(allComps, 0, 0, 1, 0)
    locally {
      val bw = new BitWriter
      mcuWalk((_, coef) => bw.put(coef(0) & 1, 1))
      bw.flush(); out.write(bw.out.toByteArray)
    }
    // per-component AC refinement to full precision
    compIds.zipWithIndex.foreach { case (cid, ci) =>
      sos(Seq(cid), 1, 63, 1, 0)
      val bw = new BitWriter
      encodeAcRefine(bw, compRaster(ci), 1, 63, 0, acEnc)
      bw.flush(); out.write(bw.out.toByteArray)
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a 4:2:2 YCbCr image as baseline JFIF (MCU = 2×1 luma
    * blocks + 1 Cb + 1 Cr; chroma half-WIDTH, full height — the
    * broadcast-video sampling). Exercises the decoder's generic
    * (h, v) ≤ 2 component walk on a shape the 4:2:0 fixture never
    * produces (vmax = 1 with hmax = 2). Edge blocks replicate. */
  def encodeColor422(width: Int, height: Int,
                     y: (Int, Int) => Int, cb: (Int, Int) => Int,
                     cr: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg: empty image")
    val cw = (width + 1) / 2
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    def dqt(id: Int, t: Array[Int]): Unit = {
      marker(0xdb); u16(2 + 1 + 64); u8(id)
      var k = 0
      while (k < 64) { u8(t(ZigZag(k))); k += 1 }
    }
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((cls << 4) | id)
      for (i <- 1 to 16) u8(bits(i))
      vals.foreach(u8)
    }
    marker(0xd8)
    marker(0xe0)
    u16(16); out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    dqt(0, QuantLum)
    dqt(1, QuantChroma)
    marker(0xc0) // SOF0: baseline, 8-bit, 3 components, 4:2:2
    u16(8 + 3 * 3)
    u8(8); u16(height); u16(width); u8(3)
    u8(1); u8(0x21); u8(0) // Y: 2x1 sampling
    u8(2); u8(0x11); u8(1)
    u8(3); u8(0x11); u8(1)
    dht(0, 0, DcBits, DcVals)
    dht(1, 0, AcBits, AcVals)
    dht(0, 1, DcBitsC, DcValsC)
    dht(1, 1, AcBitsC, AcValsC)
    marker(0xda)
    u16(6 + 2 * 3)
    u8(3)
    u8(1); u8(0x00)
    u8(2); u8(0x11)
    u8(3); u8(0x11)
    u8(0); u8(63); u8(0)
    val dcY = buildEncodeTable(DcBits, DcVals)
    val acY = buildEncodeTable(AcBits, AcVals)
    val dcC = buildEncodeTable(DcBitsC, DcValsC)
    val acC = buildEncodeTable(AcBitsC, AcValsC)
    val bw = new BitWriter
    val mcusX = (width + 15) / 16
    val mcusY = (height + 7) / 8
    var predY = 0
    var predCb = 0
    var predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var hb = 0
        while (hb < 2) { // 2×1 luma blocks, left to right
          val ox = mx * 16 + hb * 8
          val oy = my * 8
          predY = encodeBlock(bw,
            (x, yy) => y(math.min(ox + x, width - 1),
                         math.min(oy + yy, height - 1)),
            QuantLum, dcY, acY, predY)
          hb += 1
        }
        predCb = encodeBlock(bw,
          (x, yy) => cb(math.min(mx * 8 + x, cw - 1),
                        math.min(my * 8 + yy, height - 1)),
          QuantChroma, dcC, acC, predCb)
        predCr = encodeBlock(bw,
          (x, yy) => cr(math.min(mx * 8 + x, cw - 1),
                        math.min(my * 8 + yy, height - 1)),
          QuantChroma, dcC, acC, predCr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(bw.out.toByteArray)
    marker(0xd9)
    out.toByteArray
  }

  /** Encode a 4:2:0 YCbCr image as baseline JFIF (T.81 A.2: MCU =
    * 2×2 luma blocks + 1 Cb + 1 Cr, interleaved single scan). `y`
    * samples the full-resolution luma plane; `cb`/`cr` sample the
    * HALF-resolution chroma planes (⌈w/2⌉ × ⌈h/2⌉ — 4:2:0 stores
    * chroma at half resolution in both axes; no upsampling happens at
    * encode). Edge blocks replicate the border sample per plane. */
  def encodeColor420(width: Int, height: Int,
                     y: (Int, Int) => Int, cb: (Int, Int) => Int,
                     cr: (Int, Int) => Int,
                     restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg: empty image")
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    def dqt(id: Int, t: Array[Int]): Unit = {
      marker(0xdb); u16(2 + 1 + 64); u8(id)
      var k = 0
      while (k < 64) { u8(t(ZigZag(k))); k += 1 }
    }
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((cls << 4) | id)
      for (i <- 1 to 16) u8(bits(i))
      vals.foreach(u8)
    }

    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF
    u16(16); out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    dqt(0, QuantLum)
    dqt(1, QuantChroma)
    marker(0xc0) // SOF0: baseline, 8-bit, 3 components, 4:2:0
    u16(8 + 3 * 3)
    u8(8); u16(height); u16(width); u8(3)
    u8(1); u8(0x22); u8(0) // Y: 2x2 sampling, qtable 0
    u8(2); u8(0x11); u8(1) // Cb: 1x1, qtable 1
    u8(3); u8(0x11); u8(1) // Cr: 1x1, qtable 1
    dht(0, 0, DcBits, DcVals)
    dht(1, 0, AcBits, AcVals)
    dht(0, 1, DcBitsC, DcValsC)
    dht(1, 1, AcBitsC, AcValsC)
    if (restartInterval > 0) {
      marker(0xdd) // DRI
      u16(4); u16(restartInterval)
    }
    marker(0xda) // SOS
    u16(6 + 2 * 3)
    u8(3)
    u8(1); u8(0x00) // Y uses DC 0 / AC 0
    u8(2); u8(0x11) // Cb uses DC 1 / AC 1
    u8(3); u8(0x11) // Cr uses DC 1 / AC 1
    u8(0); u8(63); u8(0)

    val dcY = buildEncodeTable(DcBits, DcVals)
    val acY = buildEncodeTable(AcBits, AcVals)
    val dcC = buildEncodeTable(DcBitsC, DcValsC)
    val acC = buildEncodeTable(AcBitsC, AcValsC)
    val bw = new BitWriter
    val mcusX = (width + 15) / 16
    val mcusY = (height + 15) / 16
    var predY = 0
    var predCb = 0
    var predCr = 0
    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // 4 luma blocks, left-to-right then top-to-bottom (T.81 A.2.3)
        var vb = 0
        while (vb < 2) {
          var hb = 0
          while (hb < 2) {
            val ox = mx * 16 + hb * 8
            val oy = my * 16 + vb * 8
            predY = encodeBlock(bw,
              (x, yy) => y(math.min(ox + x, width - 1),
                           math.min(oy + yy, height - 1)),
              QuantLum, dcY, acY, predY)
            hb += 1
          }
          vb += 1
        }
        predCb = encodeBlock(bw,
          (x, yy) => cb(math.min(mx * 8 + x, cw - 1),
                        math.min(my * 8 + yy, ch - 1)),
          QuantChroma, dcC, acC, predCb)
        predCr = encodeBlock(bw,
          (x, yy) => cr(math.min(mx * 8 + x, cw - 1),
                        math.min(my * 8 + yy, ch - 1)),
          QuantChroma, dcC, acC, predCr)
        mcu += 1
        if (restartInterval > 0 && mcu % restartInterval == 0 &&
            mcu < mcusX * mcusY) {
          bw.restart(rst); rst = (rst + 1) % 8
          predY = 0; predCb = 0; predCr = 0
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(bw.out.toByteArray)
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------

  final case class Decoded(width: Int, height: Int, nBlocks: Int,
                           pixels: Array[Byte])

  /** One decoded component plane at its NATIVE resolution
    * (T.81 A.1.1: ⌈width·h/hmax⌉ × ⌈height·v/vmax⌉ — for 4:2:0 the
    * chroma planes are half-size in both axes; no upsampling). */
  final case class Plane(w: Int, h: Int, samples: Array[Byte])

  /** Full decode result: planes in SOF component order (gray: 1 plane;
    * YCbCr: Y, Cb, Cr). `nUnits` counts decoded 8×8 blocks across all
    * components. */
  final case class DecodedImage(width: Int, height: Int, nUnits: Int,
                                planes: Array[Plane])

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int,
                                var dcSel: Int = 0, var acSel: Int = 0)

  /** Decode a baseline-sequential JFIF stream: full marker walk,
    * canonical Huffman decode (tables from the stream's own DHT),
    * dequant, de-zigzag, double-precision IDCT, level shift + clamp.
    * Supports single-component (grayscale) scans, the dominant
    * 3-component interleaved shape with sampling factors ≤ 2×2
    * (4:2:0 / 4:2:2 / 4:4:4), and restart intervals (DRI + RSTn with
    * DC-prediction reset and cycle verification — the camera-JPEG
    * framing). Rejects progressive streams loudly — honest scope,
    * not silent garbage.
    *
    * Untrusted-byte contract: IllegalArgumentException or success;
    * every field read is bounded by the segment's declared length
    * (not just the stream end), and standalone markers before SOS
    * (TEM, RSTn) are skipped as zero-length while a premature EOI is
    * rejected — neither misreads payload bytes as a length. */
  def decode(bytes: Array[Byte]): DecodedImage = {
    require(bytes.length > 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "jpeg: missing SOI")
    var pos = 2
    var width = 0
    var height = 0
    var comps: Array[Comp] = null
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[DecodeTable](4)
    val acTabs = new Array[DecodeTable](4)
    var sosAt = -1
    var scanComps: Array[Comp] = null
    var restartInterval = 0
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    while (sosAt < 0) {
      require(pos + 2 <= bytes.length, "jpeg: truncated before SOS")
      require((bytes(pos) & 0xff) == 0xff, "jpeg: expected marker")
      val m = bytes(pos + 1) & 0xff
      // Standalone markers carry NO length field (T.81 B.1.1.3):
      // reading one would misinterpret payload bytes as a length.
      // TEM / RSTn before SOS are parametric no-ops; EOI here means
      // the stream ended without a scan.
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { pos += 2 }
      else if (m == 0xd9) {
        throw new IllegalArgumentException("jpeg: EOI before SOS")
      } else {
        require(pos + 4 <= bytes.length, "jpeg: truncated before SOS")
        val len = u16(pos + 2)
        require(len >= 2, f"jpeg: segment FF$m%02X declares length $len < 2")
        val seg = pos + 4
        val segEnd = seg + len - 2 // first byte past this segment's payload
        require(segEnd <= bytes.length,
          f"jpeg: segment FF$m%02X (len=$len) runs past end of stream")
        m match {
          case 0xdb => // DQT: one or more tables in the segment
            var p = seg
            while (p < segEnd) {
              val pq = (bytes(p) & 0xff) >> 4
              val tq = bytes(p) & 0x0f
              require(pq == 0, "jpeg: 16-bit quant tables unsupported")
              require(tq < 4, s"jpeg: quant table id $tq out of range")
              require(p + 65 <= segEnd,
                "jpeg: DQT table runs past its segment")
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) {
                t(ZigZag(i)) = bytes(p + 1 + i) & 0xff; i += 1
              }
              quant(tq) = t
              p += 65
            }
          case 0xc0 => // SOF0 baseline
            require(len >= 8, s"jpeg: SOF0 length $len too short")
            require((bytes(seg) & 0xff) == 8, "jpeg: only 8-bit samples")
            height = u16(seg + 1)
            width = u16(seg + 3)
            val nc = bytes(seg + 5) & 0xff
            require(nc == 1 || nc == 3,
              s"jpeg: $nc components; this decoder handles 1 or 3")
            require(len >= 8 + 3 * nc,
              s"jpeg: SOF0 length $len short for $nc components")
            comps = Array.tabulate(nc) { i =>
              val p = seg + 6 + 3 * i
              val c = Comp(bytes(p) & 0xff, (bytes(p + 1) & 0xff) >> 4,
                           bytes(p + 1) & 0x0f, bytes(p + 2) & 0x0f)
              require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
                s"jpeg: sampling ${c.h}x${c.v} unsupported (max 2x2)")
              require(c.tq < 4,
                s"jpeg: SOF quant selector ${c.tq} out of range")
              c
            }
            if (nc == 1)
              require(comps(0).h == 1 && comps(0).v == 1,
                "jpeg: subsampling on a single component")
          case 0xc2 => // SOF2: progressive — the Annex G path
            return decodeProgressive(bytes)
          case 0xc1 | 0xc3 =>
            throw new IllegalArgumentException(
              f"jpeg: SOF$m%02X (non-baseline) unsupported")
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = (bytes(p) & 0xff) >> 4
              val th = bytes(p) & 0x0f
              require(tc < 2 && th < 4,
                s"jpeg: huffman table class/id $tc/$th out of range")
              require(p + 17 <= segEnd,
                "jpeg: DHT counts run past their segment")
              val bits = new Array[Int](17)
              var total = 0
              var i = 1
              while (i <= 16) {
                bits(i) = bytes(p + i) & 0xff; total += bits(i); i += 1
              }
              require(p + 17 + total <= segEnd,
                "jpeg: DHT values run past their segment")
              val vals = new Array[Int](total)
              i = 0
              while (i < total) { vals(i) = bytes(p + 17 + i) & 0xff; i += 1 }
              val tab = new DecodeTable(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + total
            }
          case 0xdd => // DRI: restart interval in MCUs
            require(len >= 4, s"jpeg: DRI length $len too short")
            restartInterval = u16(seg)
          case 0xda => // SOS
            require(comps != null, "jpeg: SOS before SOF")
            require(len >= 3, s"jpeg: SOS length $len too short")
            val ns = bytes(seg) & 0xff
            require(ns == comps.length,
              s"jpeg: scan has $ns components, frame has ${comps.length} " +
                "(partial scans unsupported)")
            require(len >= 6 + 2 * ns,
              s"jpeg: SOS length $len short for $ns components")
            scanComps = new Array[Comp](ns)
            var i = 0
            while (i < ns) {
              val cid = bytes(seg + 1 + 2 * i) & 0xff
              val sel = bytes(seg + 2 + 2 * i) & 0xff
              val c = comps.find(_.id == cid).getOrElse(
                throw new IllegalArgumentException(
                  s"jpeg: SOS names unknown component id $cid"))
              c.dcSel = sel >> 4
              c.acSel = sel & 0x0f
              require(c.dcSel < 4 && c.acSel < 4,
                s"jpeg: SOS table selectors ${c.dcSel}/${c.acSel} out of range")
              scanComps(i) = c
              i += 1
            }
            sosAt = seg + 1 + 2 * ns + 3
            require(sosAt <= bytes.length, "jpeg: SOS header truncated")
          case _ => // APPn / COM / others: skip
        }
        pos = if (m == 0xda) sosAt else segEnd
      }
    }
    require(width > 0 && height > 0, "jpeg: SOS before SOF")
    scanComps.foreach { c =>
      require(quant(c.tq) != null, s"jpeg: missing quant table ${c.tq}")
      require(dcTabs(c.dcSel) != null && acTabs(c.acSel) != null,
        s"jpeg: missing huffman table for component ${c.id}")
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // Dimension-bomb guard (r11 ADVICE): buffer sizes are computed in
    // LONG and capped BEFORE any allocation — a few hundred crafted
    // bytes can declare 65535×65535 at 2×2 sampling, whose Int
    // padW·mcusY·v·8 product wraps past 2^32 (later dying as an
    // ArrayIndexOutOfBounds) or demands multi-GB planes. Untrusted
    // bytes must decode or throw IllegalArgumentException (the
    // fuzz-pinned contract), and a corpus decoder must bound its
    // per-image memory; 1 GiB of total plane bytes is far above any
    // legitimate fixture and far below an executor heap.
    val totalPlaneBytes = comps.map(c =>
      (mcusX * c.h * 8L) * (mcusY * c.v * 8L)).sum
    require(totalPlaneBytes <= (1L << 30),
      s"jpeg: image too large ($width x $height at sampling " +
        s"${comps.map(c => s"${c.h}x${c.v}").mkString("/")}: " +
        s"$totalPlaneBytes plane bytes > ${1L << 30} cap)")
    // per-component native plane dims (T.81 A.1.1) and padded buffers
    // sized to the MCU grid; cropped at the end
    val planeW = comps.map(c => (width * c.h + hmax - 1) / hmax)
    val planeH = comps.map(c => (height * c.v + vmax - 1) / vmax)
    val padW = comps.map(c => mcusX * c.h * 8)
    val buf = comps.indices.map(i =>
      new Array[Byte](padW(i) * mcusY * comps(i).v * 8)).toArray

    val br = new BitReader(bytes, sosAt)
    def decodeHuff(t: DecodeTable): Int = {
      var code = br.bit()
      var len = 1
      while (t.maxCode(len) < 0 || code > t.maxCode(len)) {
        require(len < 16, "jpeg: invalid huffman code")
        code = (code << 1) | br.bit()
        len += 1
      }
      t.value(len, code)
    }

    val coef = new Array[Int](64)
    val preds = new Array[Int](comps.length)
    var nUnits = 0
    var mcuIdx = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // restart boundary BEFORE this MCU (T.81 F.2.1.3.1): consume
        // the byte-aligned RSTm, verify its cycle, reset DC prediction
        if (restartInterval > 0 && mcuIdx > 0 &&
            mcuIdx % restartInterval == 0) {
          br.expectRestart(rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        mcuIdx += 1
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          val compIdx = comps.indexOf(c)
          val q = quant(c.tq)
          val dcT = dcTabs(c.dcSel)
          val acT = acTabs(c.acSel)
          var vb = 0
          while (vb < c.v) {
            var hb = 0
            while (hb < c.h) {
              java.util.Arrays.fill(coef, 0)
              val s0 = decodeHuff(dcT)
              require(s0 <= 11, s"jpeg: DC category $s0 out of range")
              preds(compIdx) += extend(br.bits(s0), s0)
              coef(0) = preds(compIdx) * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = decodeHuff(acT)
                if (rs == 0x00) eob = true
                else if (rs == 0xf0) k += 16
                else {
                  k += rs >> 4
                  require(k < 64, "jpeg: AC run past block end")
                  val s = rs & 0x0f
                  val nat = ZigZag(k)
                  coef(nat) = extend(br.bits(s), s) * q(nat)
                  k += 1
                }
              }
              nUnits += 1
              idctBlock(coef, buf(compIdx), padW(compIdx),
                (mx * c.h + hb) * 8, (my * c.v + vb) * 8)
              hb += 1
            }
            vb += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    val planes = comps.indices.map { i =>
      val pw = planeW(i)
      val ph = planeH(i)
      val w = padW(i)
      val outPx = new Array[Byte](pw * ph)
      var y = 0
      while (y < ph) {
        System.arraycopy(buf(i), y * w, outPx, y * pw, pw)
        y += 1
      }
      Plane(pw, ph, outPx)
    }.toArray
    DecodedImage(width, height, nUnits, planes)
  }

  /** Decode a PROGRESSIVE (SOF2) JFIF stream per T.81 Annex G: the
    * frame's quantized coefficients accumulate across scans — DC
    * first/refinement (successive approximation; interleaved multi-
    * component DC scans supported), AC first/refinement per spectral
    * band (non-interleaved, single component per scan, with EOBn run
    * codes) — then one dequant + IDCT pass renders the planes. The
    * scan machinery mirrors the baseline decoder: tables from the
    * stream's own DQT/DHT (re-definable between scans, as the
    * standard allows), byte stuffing, restart intervals with
    * prediction/EOB-run reset, and the same untrusted-byte contract
    * (decode or IllegalArgumentException, buffer sizes Long-checked
    * and capped before allocation). */
  private def decodeProgressive(bytes: Array[Byte]): DecodedImage = {
    var pos = 2
    var width = 0
    var height = 0
    var comps: Array[Comp] = null
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[DecodeTable](4)
    val acTabs = new Array[DecodeTable](4)
    var restartInterval = 0
    var coefBufs: Array[Array[Int]] = null // per comp: padded block grid × 64
    var mcusX = 0
    var mcusY = 0
    var hmax = 1
    var vmax = 1
    val preds = new Array[Int](4)
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)

    def decodeScan(scanComps: Array[Comp], ss: Int, se: Int,
                   ah: Int, al: Int, from: Int): Int = {
      require(comps != null, "jpeg: SOS before SOF")
      scanComps.foreach { c =>
        require(quant(c.tq) != null, s"jpeg: missing quant table ${c.tq}")
        if (ss == 0 && ah == 0)
          require(dcTabs(c.dcSel) != null,
            s"jpeg: missing DC huffman table for component ${c.id}")
        if (ss > 0 && ah == 0)
          require(acTabs(c.acSel) != null,
            s"jpeg: missing AC huffman table for component ${c.id}")
        if (ss > 0 && ah > 0)
          require(acTabs(c.acSel) != null,
            s"jpeg: missing AC huffman table for component ${c.id}")
      }
      require(ss <= se && se < 64, s"jpeg: bad spectral band $ss..$se")
      if (ss == 0)
        require(se == 0, "jpeg: DC scan with AC coefficients (Se > 0)")
      else
        require(scanComps.length == 1,
          "jpeg: interleaved AC scan (progressive AC scans are " +
            "single-component)")
      require(ah == 0 || ah == al + 1,
        s"jpeg: successive approximation Ah=$ah Al=$al out of sequence")
      val br = new BitReader(bytes, from)
      var eobrun = 0
      java.util.Arrays.fill(preds, 0)
      def decodeHuff(t: DecodeTable): Int = {
        var code = br.bit()
        var len = 1
        while (t.maxCode(len) < 0 || code > t.maxCode(len)) {
          require(len < 16, "jpeg: invalid huffman code")
          code = (code << 1) | br.bit()
          len += 1
        }
        t.value(len, code)
      }
      val p1 = 1 << al
      val m1 = -1 << al

      def dcFirst(c: Comp, coef: Array[Int], base: Int): Unit = {
        val s = decodeHuff(dcTabs(c.dcSel))
        require(s <= 11, s"jpeg: DC category $s out of range")
        val ci = comps.indexOf(c)
        preds(ci) += extend(br.bits(s), s)
        coef(base) = preds(ci) << al
      }
      def dcRefine(coef: Array[Int], base: Int): Unit =
        if (br.bit() == 1) coef(base) |= p1

      def acFirst(c: Comp, coef: Array[Int], base: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        while (k <= se) {
          val rs = decodeHuff(acTabs(c.acSel))
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += br.bits(r)
              return
            }
          } else {
            k += r
            require(k <= se, "jpeg: AC run past band end")
            coef(base + ZigZag(k)) = extend(br.bits(s), s) << al
            k += 1
          }
        }
      }
      def acRefine(c: Comp, coef: Array[Int], base: Int): Unit = {
        var k = ss
        if (eobrun == 0) {
          var broke = false
          while (!broke && k <= se) {
            val rs = decodeHuff(acTabs(c.acSel))
            var r = rs >> 4
            val s = rs & 0x0f
            var insert = 0
            if (s == 0) {
              if (r < 15) {
                eobrun = 1 << r
                if (r > 0) eobrun += br.bits(r)
                broke = true
              }
              // r == 15: ZRL — advance over 16 zero-history coefs
            } else {
              require(s == 1, s"jpeg: AC refinement size $s != 1")
              insert = if (br.bit() == 1) p1 else m1
            }
            if (!broke) {
              var placed = false
              while (!placed && k <= se) {
                val z = base + ZigZag(k)
                if (coef(z) != 0) {
                  if (br.bit() == 1 && (coef(z) & p1) == 0)
                    coef(z) += (if (coef(z) >= 0) p1 else m1)
                } else {
                  if (r == 0) {
                    if (insert != 0) coef(z) = insert
                    placed = true
                  } else r -= 1
                }
                k += 1
              }
              require(placed || insert == 0,
                "jpeg: AC refinement run past band end")
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val z = base + ZigZag(k)
            if (coef(z) != 0) {
              if (br.bit() == 1 && (coef(z) & p1) == 0)
                coef(z) += (if (coef(z) >= 0) p1 else m1)
            }
            k += 1
          }
          eobrun -= 1
        }
      }

      // Walk the scan's data units. DC scans (interleaved or not)
      // cover the MCU grid; AC scans cover the single component's own
      // (non-padded) block grid in raster order (T.81 G.1.1 / A.2.2).
      if (ss == 0 && scanComps.length > 1) {
        // interleaved DC scan: MCU walk, h×v blocks per component
        var unitIdx = 0
        var rstIdx = 0
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (restartInterval > 0 && unitIdx > 0 &&
                unitIdx % restartInterval == 0) {
              br.expectRestart(rstIdx)
              rstIdx = (rstIdx + 1) % 8
              java.util.Arrays.fill(preds, 0)
              eobrun = 0
            }
            unitIdx += 1
            var ci = 0
            while (ci < scanComps.length) {
              val c = scanComps(ci)
              val compIdx = comps.indexOf(c)
              val wBlocks = mcusX * c.h
              var vb = 0
              while (vb < c.v) {
                var hb = 0
                while (hb < c.h) {
                  val bIdx = (my * c.v + vb) * wBlocks + (mx * c.h + hb)
                  if (ah == 0) dcFirst(c, coefBufs(compIdx), bIdx * 64)
                  else dcRefine(coefBufs(compIdx), bIdx * 64)
                  hb += 1
                }
                vb += 1
              }
              ci += 1
            }
            mx += 1
          }
          my += 1
        }
      } else {
        // single-component scan (DC or AC): the component's own grid
        val c = scanComps(0)
        val compIdx = comps.indexOf(c)
        val wBlocks = mcusX * c.h // padded grid width (storage)
        val cw = (width * c.h + hmax - 1) / hmax
        val chh = (height * c.v + vmax - 1) / vmax
        val nbx = (cw + 7) / 8
        val nby = (chh + 7) / 8
        var unitIdx = 0
        var rstIdx = 0
        var by = 0
        while (by < nby) {
          var bx = 0
          while (bx < nbx) {
            if (restartInterval > 0 && unitIdx > 0 &&
                unitIdx % restartInterval == 0) {
              br.expectRestart(rstIdx)
              rstIdx = (rstIdx + 1) % 8
              java.util.Arrays.fill(preds, 0)
              eobrun = 0
            }
            unitIdx += 1
            val base = (by * wBlocks + bx) * 64
            if (ss == 0) {
              if (ah == 0) dcFirst(c, coefBufs(compIdx), base)
              else dcRefine(coefBufs(compIdx), base)
            } else {
              if (ah == 0) acFirst(c, coefBufs(compIdx), base)
              else acRefine(c, coefBufs(compIdx), base)
            }
            bx += 1
          }
          by += 1
        }
      }
      // the scan's entropy data ends where the next marker begins;
      // any partial byte is padding
      br.pos
    }

    var sawEoi = false
    while (!sawEoi) {
      require(pos + 2 <= bytes.length, "jpeg: truncated before EOI")
      require((bytes(pos) & 0xff) == 0xff, "jpeg: expected marker")
      val m = bytes(pos + 1) & 0xff
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { pos += 2 }
      else if (m == 0xd9) { sawEoi = true }
      else {
        require(pos + 4 <= bytes.length, "jpeg: truncated segment")
        val len = u16(pos + 2)
        require(len >= 2, f"jpeg: segment FF$m%02X declares length $len < 2")
        val seg = pos + 4
        val segEnd = seg + len - 2
        require(segEnd <= bytes.length,
          f"jpeg: segment FF$m%02X (len=$len) runs past end of stream")
        m match {
          case 0xdb =>
            var p = seg
            while (p < segEnd) {
              val pq = (bytes(p) & 0xff) >> 4
              val tq = bytes(p) & 0x0f
              require(pq == 0, "jpeg: 16-bit quant tables unsupported")
              require(tq < 4, s"jpeg: quant table id $tq out of range")
              require(p + 65 <= segEnd,
                "jpeg: DQT table runs past its segment")
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) {
                t(ZigZag(i)) = bytes(p + 1 + i) & 0xff; i += 1
              }
              quant(tq) = t
              p += 65
            }
          case 0xc2 =>
            require(comps == null, "jpeg: multiple SOF segments")
            require(len >= 8, s"jpeg: SOF2 length $len too short")
            require((bytes(seg) & 0xff) == 8, "jpeg: only 8-bit samples")
            height = u16(seg + 1)
            width = u16(seg + 3)
            require(width > 0 && height > 0, "jpeg: empty frame")
            val nc = bytes(seg + 5) & 0xff
            require(nc == 1 || nc == 3,
              s"jpeg: $nc components; this decoder handles 1 or 3")
            require(len >= 8 + 3 * nc,
              s"jpeg: SOF2 length $len short for $nc components")
            comps = Array.tabulate(nc) { i =>
              val p = seg + 6 + 3 * i
              val c = Comp(bytes(p) & 0xff, (bytes(p + 1) & 0xff) >> 4,
                           bytes(p + 1) & 0x0f, bytes(p + 2) & 0x0f)
              require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
                s"jpeg: sampling ${c.h}x${c.v} unsupported (max 2x2)")
              require(c.tq < 4,
                s"jpeg: SOF quant selector ${c.tq} out of range")
              c
            }
            if (nc == 1)
              require(comps(0).h == 1 && comps(0).v == 1,
                "jpeg: subsampling on a single component")
            hmax = comps.map(_.h).max
            vmax = comps.map(_.v).max
            mcusX = (width + 8 * hmax - 1) / (8 * hmax)
            mcusY = (height + 8 * vmax - 1) / (8 * vmax)
            // dimension-bomb guard (same contract as baseline): Long
            // math + cap BEFORE the coefficient buffers allocate
            // (coefficients are Ints — 4 bytes per sample here)
            val totalCoefBytes = comps.map(c =>
              (mcusX * c.h * 8L) * (mcusY * c.v * 8L) * 4L).sum
            require(totalCoefBytes <= (1L << 30),
              s"jpeg: image too large ($width x $height at sampling " +
                s"${comps.map(c => s"${c.h}x${c.v}").mkString("/")}: " +
                s"$totalCoefBytes coef bytes > ${1L << 30} cap)")
            coefBufs = comps.map(c =>
              new Array[Int](mcusX * c.h * mcusY * c.v * 64))
          case 0xc0 | 0xc1 | 0xc3 =>
            throw new IllegalArgumentException(
              f"jpeg: SOF$m%02X inside a progressive decode")
          case 0xc4 =>
            var p = seg
            while (p < segEnd) {
              val tc = (bytes(p) & 0xff) >> 4
              val th = bytes(p) & 0x0f
              require(tc < 2 && th < 4,
                s"jpeg: huffman table class/id $tc/$th out of range")
              require(p + 17 <= segEnd,
                "jpeg: DHT counts run past their segment")
              val bits = new Array[Int](17)
              var total = 0
              var i = 1
              while (i <= 16) {
                bits(i) = bytes(p + i) & 0xff; total += bits(i); i += 1
              }
              require(p + 17 + total <= segEnd,
                "jpeg: DHT values run past their segment")
              val vals = new Array[Int](total)
              i = 0
              while (i < total) { vals(i) = bytes(p + 17 + i) & 0xff; i += 1 }
              val tab = new DecodeTable(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + total
            }
          case 0xdd =>
            require(len >= 4, s"jpeg: DRI length $len too short")
            restartInterval = u16(seg)
          case 0xda =>
            require(comps != null, "jpeg: SOS before SOF")
            require(len >= 3, s"jpeg: SOS length $len too short")
            val ns = bytes(seg) & 0xff
            require(ns >= 1 && ns <= comps.length,
              s"jpeg: scan has $ns components, frame has ${comps.length}")
            require(len >= 6 + 2 * ns,
              s"jpeg: SOS length $len short for $ns components")
            val scanComps = Array.tabulate(ns) { i =>
              val cid = bytes(seg + 1 + 2 * i) & 0xff
              val sel = bytes(seg + 2 + 2 * i) & 0xff
              val c = comps.find(_.id == cid).getOrElse(
                throw new IllegalArgumentException(
                  s"jpeg: SOS names unknown component id $cid"))
              c.dcSel = sel >> 4
              c.acSel = sel & 0x0f
              require(c.dcSel < 4 && c.acSel < 4,
                s"jpeg: SOS table selectors out of range")
              c
            }
            val pSs = seg + 1 + 2 * ns
            require(pSs + 3 <= bytes.length, "jpeg: SOS header truncated")
            val ss = bytes(pSs) & 0xff
            val se = bytes(pSs + 1) & 0xff
            val ahAl = bytes(pSs + 2) & 0xff
            pos = decodeScan(scanComps, ss, se, ahAl >> 4, ahAl & 0x0f,
              pSs + 3)
            // a 1-padded final entropy byte can itself be FF 00
            // (stuffed); it belongs to the scan, not the marker walk
            while (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
                   (bytes(pos + 1) & 0xff) == 0x00) pos += 2
          case _ => // APPn / COM / others: skip
        }
        if (m != 0xda) pos = segEnd
      }
    }
    require(comps != null, "jpeg: EOI before SOF")

    // one dequant + IDCT pass over the accumulated coefficients
    val planeW = comps.map(c => (width * c.h + hmax - 1) / hmax)
    val planeH = comps.map(c => (height * c.v + vmax - 1) / vmax)
    val padW = comps.map(c => mcusX * c.h * 8)
    val buf = comps.indices.map(i =>
      new Array[Byte](padW(i) * mcusY * comps(i).v * 8)).toArray
    var nUnits = 0
    val dq = new Array[Int](64)
    comps.indices.foreach { i =>
      val c = comps(i)
      val q = quant(c.tq)
      require(q != null, s"jpeg: missing quant table ${c.tq}")
      val wBlocks = mcusX * c.h
      val nbx = (planeW(i) + 7) / 8
      val nby = (planeH(i) + 7) / 8
      var by = 0
      while (by < nby) {
        var bx = 0
        while (bx < nbx) {
          val base = (by * wBlocks + bx) * 64
          var j = 0
          while (j < 64) {
            dq(j) = coefBufs(i)(base + j) * q(j); j += 1
          }
          idctBlock(dq, buf(i), padW(i), bx * 8, by * 8)
          nUnits += 1
          bx += 1
        }
        by += 1
      }
    }
    val planes = comps.indices.map { i =>
      val pw = planeW(i)
      val ph = planeH(i)
      val w = padW(i)
      val outPx = new Array[Byte](pw * ph)
      var y = 0
      while (y < ph) {
        System.arraycopy(buf(i), y * w, outPx, y * pw, pw)
        y += 1
      }
      Plane(pw, ph, outPx)
    }.toArray
    DecodedImage(width, height, nUnits, planes)
  }

  /** Grayscale decode — the round-10 surface, now a view over the
    * general decoder: rejects multi-component streams, returns the
    * single luma plane. */
  def decodeGray8(bytes: Array[Byte]): Decoded = {
    val img = decode(bytes)
    require(img.planes.length == 1,
      s"jpeg: ${img.planes.length} components; this decoder is grayscale-only")
    Decoded(img.width, img.height, img.nUnits, img.planes(0).samples)
  }
}
