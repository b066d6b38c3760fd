package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Gif

/** The GIF codec is plain JVM code — no Spark session needed. */
class GifSpec extends AnyFunSuite {

  test("encode/decode round-trip is lossless (GIF is lossless)") {
    for ((w, h, f) <- Seq[(Int, Int, (Int, Int) => Int)](
        (1, 1, (_, _) => 42),
        (13, 7, (x, y) => (x * 31 + y * 17 + 5) % 251),
        (40, 24, (x, y) => (x * 3 + y * 40) % 251),
        (17, 11, (x, y) => if ((x + y) % 2 == 0) 0 else 255))) {
      val dec = Gif.decodeGray8(Gif.encodeGray8(w, h, f))
      assert(dec.width == w && dec.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((dec.pixels(y * w + x) & 0xff) == (f(x, y) & 0xff),
          s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("uniform image exercises the KwKwK self-referencing code path") {
    // runs of one value produce code == next at decode (the classic
    // cScSc case every LZW decoder must special-case)
    val dec = Gif.decodeGray8(Gif.encodeGray8(64, 64, (_, _) => 200))
    assert(dec.pixels.forall(b => (b & 0xff) == 200))
  }

  test("high-entropy image crosses code widths and the 4096 clear") {
    // 160x128 = 20480 seeded-random pixels: the dictionary fills past
    // every width boundary (9->10->11->12) and forces at least one
    // mid-stream clear code; the decode must still be bit-exact
    var seed = 0xdeadbeefL
    val px = Array.tabulate(160 * 128) { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 40) & 0xff).toInt
    }
    val dec = Gif.decodeGray8(
      Gif.encodeGray8(160, 128, (x, y) => px(y * 160 + x)))
    assert(dec.width == 160 && dec.height == 128)
    for (i <- px.indices)
      assert((dec.pixels(i) & 0xff) == px(i), s"pixel $i")
    // the sub-block framing really was multi-block (255-byte cap)
    assert(dec.nSubBlocks > 10, s"only ${dec.nSubBlocks} sub-blocks")
  }

  test("interlaced encode/decode: framing changes, pixels do not") {
    for ((w, h) <- Seq((13, 7), (40, 24), (16, 3), (8, 1))) {
      def f(x: Int, y: Int): Int = (x * 31 + y * 17 + 5) % 251
      val seq = Gif.decodeGray8(Gif.encodeGray8(w, h, f))
      val int = Gif.decodeGray8(
        Gif.encodeGray8(w, h, f, interlaced = true))
      assert(int.pixels.sameElements(seq.pixels),
        s"interlaced decode diverged at ${w}x$h, first diff " +
          s"${int.pixels.zip(seq.pixels).indexWhere(p => p._1 != p._2)}")
    }
    // the 4-pass schedule is a permutation for every height
    for (h <- 1 to 40) {
      val rows = Gif.interlaceRows(h)
      assert(rows.sorted.sameElements(Array.tabulate(h)(identity)),
        s"interlace schedule for h=$h is not a permutation")
    }
  }

  test("GIF89a extensions are skipped by their sub-block framing") {
    val base = Gif.encodeGray8(8, 4, (x, y) => (x + y * 8) * 7 % 251)
    // splice a graphic-control extension after the palette:
    // header(6) + screen(7) + palette(768) = 781
    val cut = 6 + 7 + 768
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = base.take(cut) ++ ext ++ base.drop(cut)
    spliced(4) = '9'.toByte // GIF89a
    val dec = Gif.decodeGray8(spliced)
    assert(dec.width == 8 && dec.height == 4)
    assert((dec.pixels(9) & 0xff) == (1 + 8) * 7 % 251)
  }

  test("fuzz: corrupted streams fail cleanly, never uncontrolled") {
    val base = Gif.encodeGray8(24, 16,
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
      try { Gif.decodeGray8(b); decoded += 1 }
      catch {
        case _: IllegalArgumentException => rejected += 1
      }
    }
    assert(decoded + rejected == 1000)
    assert(rejected > 0)
  }

  test("dimension bomb: huge declared dims reject before allocation") {
    val base = Gif.encodeGray8(8, 4, (_, _) => 1)
    val bomb = base.clone()
    // screen + image descriptors both patched to 65535x65535
    bomb(6) = 0xff.toByte; bomb(7) = 0xff.toByte
    bomb(8) = 0xff.toByte; bomb(9) = 0xff.toByte
    val imgDesc = 6 + 7 + 768 // image descriptor offset
    for (i <- 5 to 8) bomb(imgDesc + i) = 0xff.toByte
    val e = intercept[IllegalArgumentException](Gif.decodeGray8(bomb))
    assert(e.getMessage.contains("too large"), e.getMessage)
  }
}
