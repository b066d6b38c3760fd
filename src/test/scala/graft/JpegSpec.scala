package graft

import graft.engine.Jpeg

import org.scalatest.funsuite.AnyFunSuite

/** Exercises the baseline JPEG codec beyond the DC-only fixture the
  * multimodal_decode_jpeg oracle covers: general AC content (real
  * run/size Huffman coding), non-block-aligned dimensions (border
  * replication + crop), entropy byte stuffing, and the loud-rejection
  * paths — the decoder must refuse what it cannot decode, never emit
  * silent garbage.
  */
class JpegSpec extends AnyFunSuite {

  test("uniform even-valued blocks roundtrip bit-exactly") {
    // the lossless-by-construction case the oracle leans on:
    // DC-only DCT with Q(0,0)=16 | 8*(v-128) for even v
    val vals = Array(0, 2, 64, 126, 128, 130, 200, 254)
    for (v <- vals) {
      val blob = Jpeg.encodeGray8(8, 8, (_, _) => v)
      val dec = Jpeg.decodeGray8(blob)
      assert(dec.width == 8 && dec.height == 8 && dec.nBlocks == 1)
      assert(dec.pixels.forall(b => (b & 0xff) == v),
        s"uniform block of $v did not roundtrip exactly")
    }
  }

  test("smooth gradient roundtrips within quantization tolerance") {
    // general AC path: a ramp has small high-frequency energy, so
    // K.1 quantization error stays within a few levels
    val w = 24; val h = 16
    val blob = Jpeg.encodeGray8(w, h, (x, y) => (x * 5 + y * 3) % 256)
    val dec = Jpeg.decodeGray8(blob)
    assert(dec.width == w && dec.height == h && dec.nBlocks == 6)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val got = dec.pixels(y * w + x) & 0xff
      val want = (x * 5 + y * 3) % 256
      maxErr = math.max(maxErr, math.abs(got - want))
    }
    // the ramp wraps 255->0 once, whose block carries real high
    // frequencies; elsewhere the error is a couple of levels
    assert(maxErr <= 96, s"gradient max error $maxErr")
  }

  test("pseudorandom image decodes and stays plausible (stuffing path)") {
    // dense AC content makes FF bytes in the entropy stream (and
    // hence stuffing) statistically certain at this size
    val w = 64; val h = 64
    def px(x: Int, y: Int): Int = ((x * 7919 + y * 104729) ^ (x * y)) & 0xff
    val blob = Jpeg.encodeGray8(w, h, px)
    // sanity: the entropy segment really contains stuffed FF 00 pairs
    val body = blob.slice(2, blob.length - 2)
    val hasStuffing = body.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0x00)
    assert(hasStuffing, "fixture never produced a stuffed byte — " +
      "the stuffing path is not exercised")
    val dec = Jpeg.decodeGray8(blob)
    assert(dec.width == w && dec.height == h)
    var sumErr = 0L
    for (y <- 0 until h; x <- 0 until w)
      sumErr += math.abs((dec.pixels(y * w + x) & 0xff) - px(x, y))
    val meanErr = sumErr.toDouble / (w * h)
    // noise is the worst case for K.1 quantization; the mean must
    // still be far from "decoded garbage" (uniform random would give
    // a mean absolute error around 85)
    assert(meanErr < 40, s"mean abs error $meanErr")
  }

  test("non-aligned dimensions crop correctly") {
    val w = 13; val h = 10
    val blob = Jpeg.encodeGray8(w, h, (x, y) => (x * 16 + y) % 256)
    val dec = Jpeg.decodeGray8(blob)
    assert(dec.width == w && dec.height == h)
    assert(dec.pixels.length == w * h)
    assert(dec.nBlocks == 4) // 2x2 padded grid
  }

  test("fuzz: corrupted streams fail cleanly, never uncontrolled") {
    // a crawl pipeline decodes UNTRUSTED bytes: every mutation of a
    // valid stream must either decode (flipped pixel data is legal)
    // or throw the decoder's own IllegalArgumentException — never an
    // ArrayIndexOutOfBounds / NegativeArraySize / infinite loop.
    // Deterministic LCG; no wall-clock or global randomness.
    val base = Jpeg.encodeGray8(24, 16,
      (x, y) => ((x * 7919 + y * 104729) ^ (x * y)) & 0xff)
    var seed = 0x2545f4914f6cdd1dL
    def nxt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    var decoded = 0
    var rejected = 0
    for (_ <- 0 until 1000) {
      val b = base.clone()
      val flips = 1 + nxt(3)
      for (_ <- 0 until flips) b(nxt(b.length)) = nxt(256).toByte
      try { Jpeg.decodeGray8(b); decoded += 1 }
      catch {
        case _: IllegalArgumentException => rejected += 1
        // any other throwable (AIOOBE, NegativeArraySize, ...) fails
        // the test by escaping
      }
    }
    assert(decoded + rejected == 1000)
    assert(rejected > 0, "no mutation was ever rejected — the " +
      "validation paths are not being exercised")
  }

  test("progressive: decode equals baseline decode bit-for-bit") {
    // full successive approximation is lossless at coefficient level:
    // the six-scan progressive stream reconstructs the EXACT quantized
    // coefficients of the baseline encoding, so both decodes agree on
    // every pixel — general content, all AC paths (runs, ZRL, EOB
    // runs, newly-significant + correction bits) exercised
    for ((w, h, f) <- Seq[(Int, Int, (Int, Int) => Int)](
        (8, 8, (x, y) => 2 * ((x * 31 + y * 67) % 128)), // uniform-ish
        (24, 16, (x, y) => ((x * 7919 + y * 104729) ^ (x * y)) & 0xff),
        (17, 11, (x, y) => (x * 16 + y) % 256), // non-aligned dims
        (32, 32, (x, y) => if ((x / 4 + y / 4) % 2 == 0) 0 else 255),
        (40, 24, (x, y) => (x * 5 + y * 3) % 256))) {
      val base = Jpeg.decodeGray8(Jpeg.encodeGray8(w, h, f))
      val prog = Jpeg.decode(Jpeg.encodeGray8Progressive(w, h, f))
      assert(prog.planes.length == 1)
      assert(prog.width == base.width && prog.height == base.height)
      assert(prog.planes(0).samples.sameElements(base.pixels),
        s"progressive decode diverged from baseline at ${w}x$h: " +
          s"first diff at index ${prog.planes(0).samples
            .zip(base.pixels).indexWhere(p => p._1 != p._2)}")
    }
  }

  test("color 4:2:2: exactly-quantizable uniform blocks roundtrip bit-exactly") {
    // vmax = 1 with hmax = 2 — the sampling shape the 4:2:0 fixture
    // never produces; uniform blocks make the lossy path exact (the
    // 4:2:0 construction: even luma | K.1 Q(0,0)=16, chroma 128+17t |
    // K.2 Q(0,0)=17)
    val (w, h) = (32, 16) // 2×2 MCUs of 16×8
    def yv(x: Int, yy: Int) = 2 * (((yy / 8) * 4 + (x / 8)) * 23 % 128)
    def cbv(cx: Int, cy: Int) = 128 + 17 * ((cx / 8 + cy / 8) % 15 - 7)
    def crv(cx: Int, cy: Int) = 128 - 17 * ((cx / 8) % 8 - 4)
    val img = Jpeg.decode(Jpeg.encodeColor422(w, h, yv, cbv, crv))
    assert(img.planes.length == 3)
    assert(img.planes(0).w == w && img.planes(0).h == h)
    assert(img.planes(1).w == (w + 1) / 2 && img.planes(1).h == h,
      "4:2:2 chroma is half-width FULL-height")
    for (yy <- 0 until h; x <- 0 until w)
      assert((img.planes(0).samples(yy * w + x) & 0xff) == yv(x, yy),
        s"luma ($x,$yy)")
    val cw = (w + 1) / 2
    for (cy <- 0 until h; cx <- 0 until cw) {
      assert((img.planes(1).samples(cy * cw + cx) & 0xff) == cbv(cx, cy),
        s"cb ($cx,$cy)")
      assert((img.planes(2).samples(cy * cw + cx) & 0xff) == crv(cx, cy),
        s"cr ($cx,$cy)")
    }
  }

  test("fuzz: corrupted 4:2:2 streams fail cleanly") {
    val base = Jpeg.encodeColor422(24, 16,
      (x, y) => ((x * 7919 + y * 104729) ^ (x * y)) & 0xff,
      (cx, cy) => (cx * 11 + cy * 7) % 256,
      (cx, cy) => (cx * 5 + cy * 13) % 256)
    var seed = 0x6a09e667f3bcc909L
    def nxt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    var decoded = 0
    var rejected = 0
    for (_ <- 0 until 500) {
      val b = base.clone()
      b(nxt(b.length)) = nxt(256).toByte
      try { Jpeg.decode(b); decoded += 1 }
      catch { case _: IllegalArgumentException => rejected += 1 }
    }
    assert(decoded + rejected == 500)
    assert(rejected > 0)
  }

  test("progressive COLOR 4:2:0: decode equals baseline decode per plane") {
    // exercises the multi-component progressive machinery: the
    // interleaved DC scan (MCU walk, per-component prediction) and
    // per-component non-interleaved AC scans over grids narrower than
    // the MCU-padded storage (w=24 -> luma raster 3 wide, padded 4)
    for ((w, h) <- Seq((16, 16), (24, 16), (18, 10), (32, 32))) {
      def yv(x: Int, y: Int) = ((x * 7919 + y * 104729) ^ (x * y)) & 0xff
      def cbv(cx: Int, cy: Int) = (cx * 11 + cy * 7) % 256
      def crv(cx: Int, cy: Int) = (cx * 5 + cy * 13) % 256
      val base = Jpeg.decode(Jpeg.encodeColor420(w, h, yv, cbv, crv))
      val prog = Jpeg.decode(
        Jpeg.encodeColor420Progressive(w, h, yv, cbv, crv))
      assert(prog.planes.length == 3)
      for (p <- 0 until 3) {
        assert(prog.planes(p).w == base.planes(p).w &&
               prog.planes(p).h == base.planes(p).h)
        assert(prog.planes(p).samples.sameElements(base.planes(p).samples),
          s"color progressive plane $p diverged at ${w}x$h, first diff " +
            s"at ${prog.planes(p).samples.zip(base.planes(p).samples)
              .indexWhere(q => q._1 != q._2)}")
      }
    }
  }

  test("progressive restart intervals: framing changes, decoded pixels do not") {
    // exercises the progressive decoder's in-scan restart handling
    // (prediction + EOB-run reset at each RSTn) across all four scan
    // types — a claimed path nothing emitted until now
    def px(x: Int, y: Int) = ((x * 31 + y * 17) ^ (x + y)) & 0xff
    val plain = Jpeg.decode(Jpeg.encodeGray8Progressive(32, 24, px))
    for (ri <- Seq(1, 3, 5)) {
      val framed = Jpeg.decode(
        Jpeg.encodeGray8Progressive(32, 24, px, restartInterval = ri))
      assert(framed.planes(0).samples
        .sameElements(plain.planes(0).samples),
        s"restart interval $ri changed decoded pixels, first diff " +
          s"${framed.planes(0).samples.zip(plain.planes(0).samples)
            .indexWhere(p => p._1 != p._2)}")
    }
    // and the framed stream still equals the BASELINE decode
    val base = Jpeg.decodeGray8(Jpeg.encodeGray8(32, 24, px))
    assert(plain.planes(0).samples.sameElements(base.pixels))
  }

  test("fuzz: corrupted PROGRESSIVE streams fail cleanly, never uncontrolled") {
    val base = Jpeg.encodeGray8Progressive(24, 16,
      (x, y) => ((x * 7919 + y * 104729) ^ (x * y)) & 0xff)
    var seed = 0x9e3779b97f4a7c15L
    def nxt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    var decoded = 0
    var rejected = 0
    for (_ <- 0 until 1000) {
      val b = base.clone()
      val flips = 1 + nxt(3)
      for (_ <- 0 until flips) b(nxt(b.length)) = nxt(256).toByte
      try { Jpeg.decode(b); decoded += 1 }
      catch {
        case _: IllegalArgumentException => rejected += 1
      }
    }
    assert(decoded + rejected == 1000)
    assert(rejected > 0, "no mutation was ever rejected — the " +
      "progressive validation paths are not being exercised")
  }

  test("dimension bomb: huge declared SOF dims reject before allocation") {
    // a ~400-byte stream declaring 65535x65535 at 2x2 sampling used
    // to overflow the Int plane-size product (wrapping to a small
    // array, then AIOOBE) or demand multi-GB buffers; it must raise
    // the decoder's own IllegalArgumentException instead (r11 ADVICE)
    val base = Jpeg.encodeColor420(16, 16, (_, _) => 128,
      (_, _) => 128, (_, _) => 128)
    // find SOF0 (FFC0) and patch the declared height/width to 65535
    var sof = -1
    var i = 2
    while (sof < 0 && i + 1 < base.length) {
      if ((base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xc0) sof = i
      i += 1
    }
    assert(sof > 0, "fixture has no SOF0 marker")
    val bomb = base.clone()
    // SOF payload: len(2) precision(1) height(2) width(2)
    bomb(sof + 5) = 0xff.toByte; bomb(sof + 6) = 0xff.toByte
    bomb(sof + 7) = 0xff.toByte; bomb(sof + 8) = 0xff.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(bomb))
    assert(e.getMessage.contains("too large"), e.getMessage)
    // mid-size dims that DON'T overflow Int but demand GBs also reject
    val big = base.clone()
    big(sof + 5) = 0x7f.toByte; big(sof + 6) = 0xff.toByte
    big(sof + 7) = 0x7f.toByte; big(sof + 8) = 0xff.toByte
    val e2 = intercept[IllegalArgumentException](Jpeg.decode(big))
    assert(e2.getMessage.contains("too large"), e2.getMessage)
  }

  test("color 4:2:0: exactly-quantizable uniform blocks roundtrip bit-exactly") {
    // luma: even values (K.1 Q(0,0)=16 | 8(v-128)); chroma: 128+17t
    // (K.2 Q(0,0)=17 | 8*17t) — the color oracle's closed-form hook
    val w = 32; val h = 16 // 2x1 MCUs
    def yv(x: Int, y: Int) = 2 * (((y / 8) * 4 + (x / 8)) * 29 % 128)
    def cbv(cx: Int, cy: Int) = 128 + 17 * ((cx / 8 + cy / 8) % 15 - 7)
    def crv(cx: Int, cy: Int) = 128 - 17 * ((cx / 8) % 8 - 4)
    val blob = Jpeg.encodeColor420(w, h, yv, cbv, crv)
    val img = Jpeg.decode(blob)
    assert(img.width == w && img.height == h && img.planes.length == 3)
    assert(img.nUnits == 2 * (4 + 1 + 1), "2 MCUs x (4 Y + Cb + Cr)")
    val Array(py, pcb, pcr) = img.planes
    assert(py.w == w && py.h == h)
    assert(pcb.w == w / 2 && pcb.h == h / 2, "chroma at half resolution")
    for (y <- 0 until h; x <- 0 until w)
      assert((py.samples(y * w + x) & 0xff) == yv(x, y),
        s"Y($x,$y)")
    for (cy <- 0 until h / 2; cx <- 0 until w / 2) {
      assert((pcb.samples(cy * pcb.w + cx) & 0xff) == cbv(cx, cy),
        s"Cb($cx,$cy)")
      assert((pcr.samples(cy * pcr.w + cx) & 0xff) == crv(cx, cy),
        s"Cr($cx,$cy)")
    }
  }

  test("color 4:2:0: general content decodes plausibly per channel") {
    // non-aligned dims (crop + border replication on all 3 planes)
    // and dense AC content through both table families
    val w = 27; val h = 22
    def yv(x: Int, y: Int) = ((x * 7919 + y * 104729) ^ (x * y)) & 0xff
    def cv(cx: Int, cy: Int) = (cx * 11 + cy * 7) % 256
    val blob = Jpeg.encodeColor420(w, h, yv, cv, (cx, cy) => cv(cy, cx))
    val img = Jpeg.decode(blob)
    assert(img.width == w && img.height == h)
    assert(img.planes(0).w == w && img.planes(0).h == h)
    assert(img.planes(1).w == (w + 1) / 2 && img.planes(1).h == (h + 1) / 2)
    var sumErr = 0L
    for (y <- 0 until h; x <- 0 until w)
      sumErr += math.abs((img.planes(0).samples(y * w + x) & 0xff) - yv(x, y))
    assert(sumErr.toDouble / (w * h) < 40,
      s"luma mean abs error ${sumErr.toDouble / (w * h)}")
    // the smooth chroma ramp must reconstruct tightly
    var cbErr = 0
    val pcb = img.planes(1)
    for (cy <- 0 until pcb.h; cx <- 0 until pcb.w)
      cbErr = math.max(cbErr,
        math.abs((pcb.samples(cy * pcb.w + cx) & 0xff) - cv(cx, cy)))
    assert(cbErr <= 96, s"chroma max error $cbErr")
  }

  test("fuzz: corrupted COLOR streams fail cleanly, never uncontrolled") {
    // untrusted-byte parity with the gray path (r10 verdict #6)
    val base = Jpeg.encodeColor420(24, 16,
      (x, y) => ((x * 7919 + y * 104729) ^ (x * y)) & 0xff,
      (cx, cy) => (cx * 11 + cy * 7) % 256,
      (cx, cy) => (cx * 5 + cy * 13) % 256)
    var seed = 0x9e3779b97f4a7c15L
    def nxt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    var decoded = 0
    var rejected = 0
    for (_ <- 0 until 1000) {
      val b = base.clone()
      val flips = 1 + nxt(3)
      for (_ <- 0 until flips) b(nxt(b.length)) = nxt(256).toByte
      try { Jpeg.decode(b); decoded += 1 }
      catch { case _: IllegalArgumentException => rejected += 1 }
    }
    assert(decoded + rejected == 1000)
    assert(rejected > 0)
  }

  test("restart intervals: framing changes, decoded pixels do not") {
    // gray: 4x2 blocks, restart after every 3 MCUs — DC prediction
    // resets must be exactly compensated by the encoder's resets
    def px(x: Int, y: Int) = ((x * 31 + y * 17) ^ (x + y)) & 0xff
    val plain = Jpeg.decodeGray8(Jpeg.encodeGray8(32, 16, px))
    val framed = Jpeg.decodeGray8(Jpeg.encodeGray8(32, 16, px, 3))
    assert(framed.pixels.sameElements(plain.pixels),
      "restart framing changed decoded pixels")
    // the framed stream really contains RST markers
    val blob = Jpeg.encodeGray8(32, 16, px, 3)
    assert(blob.sliding(2).exists(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7),
      "no RST marker emitted")
    // color: per-MCU restarts across all three predictors
    def cv(cx: Int, cy: Int) = (cx * 11 + cy * 7) % 256
    val cPlain = Jpeg.decode(Jpeg.encodeColor420(32, 32, px, cv, cv))
    val cFramed = Jpeg.decode(Jpeg.encodeColor420(32, 32, px, cv, cv, 1))
    for (i <- 0 until 3)
      assert(cFramed.planes(i).samples
        .sameElements(cPlain.planes(i).samples), s"color plane $i differs")
    // a WRONG restart cycle is rejected loudly (corrupt stream), and
    // fuzzing a framed stream never escapes the contract
    val base = Jpeg.encodeGray8(32, 16, px, 2)
    var seed = 0x243f6a8885a308d3L
    def nxt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    var outcomes = 0
    for (_ <- 0 until 300) {
      val b = base.clone()
      b(nxt(b.length)) = nxt(256).toByte
      try { Jpeg.decodeGray8(b); outcomes += 1 }
      catch { case _: IllegalArgumentException => outcomes += 1 }
    }
    assert(outcomes == 300)
  }

  test("standalone markers before SOS: RST/TEM skipped, premature EOI rejected") {
    val ok = Jpeg.encodeGray8(8, 8, (_, _) => 100)
    // splice a standalone RST0 (no length field) right after SOI: a
    // length-reading walk would misparse the next marker's bytes
    val withRst = ok.take(2) ++ Array(0xff.toByte, 0xd0.toByte) ++ ok.drop(2)
    val dec = Jpeg.decodeGray8(withRst)
    assert(dec.width == 8 && (dec.pixels(0) & 0xff) == 100)
    // TEM likewise
    val withTem = ok.take(2) ++ Array(0xff.toByte, 0x01.toByte) ++ ok.drop(2)
    assert(Jpeg.decodeGray8(withTem).height == 8)
    // a premature EOI is a loud rejection, not a garbage length read
    val withEoi = ok.take(2) ++ Array(0xff.toByte, 0xd9.toByte) ++ ok.drop(2)
    val e = intercept[IllegalArgumentException] { Jpeg.decodeGray8(withEoi) }
    assert(e.getMessage.contains("EOI before SOS"), e.getMessage)
  }

  test("segment fields are bounded by the declared segment length") {
    // shrink SOF0's declared length below its field size: the reads
    // must fail with the decoder's own error, not run into the next
    // segment's bytes (the r10 ADVICE bound gap)
    val ok = Jpeg.encodeGray8(8, 8, (_, _) => 100)
    val sofAt = ok.indices.find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0).get
    val shrunk = ok.clone()
    shrunk(sofAt + 2) = 0; shrunk(sofAt + 3) = 4 // len=4 < 8+3
    val e = intercept[IllegalArgumentException] { Jpeg.decodeGray8(shrunk) }
    assert(e.getMessage.contains("SOF0 length"), e.getMessage)
    // DHT declaring fewer bytes than its value table needs
    val dhtAt = ok.indices.find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc4).get
    val shrunkDht = ok.clone()
    shrunkDht(dhtAt + 2) = 0; shrunkDht(dhtAt + 3) = 10 // < 2+1+16
    val e2 = intercept[IllegalArgumentException] {
      Jpeg.decodeGray8(shrunkDht)
    }
    assert(e2.getMessage.contains("jpeg"), e2.getMessage)
  }

  test("rejects what it cannot decode, loudly") {
    val ok = Jpeg.encodeGray8(8, 8, (_, _) => 100)
    // missing SOI
    assertThrows[IllegalArgumentException] {
      Jpeg.decodeGray8(ok.drop(2))
    }
    // truncated entropy stream
    assertThrows[IllegalArgumentException] {
      Jpeg.decodeGray8(ok.dropRight(8))
    }
    // progressive SOF: flip SOF0 (FFC0) to SOF2 (FFC2)
    val prog = ok.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assertThrows[IllegalArgumentException] { Jpeg.decodeGray8(prog) }
  }
}
