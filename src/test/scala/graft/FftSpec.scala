package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Fft

/** The FFT is plain JVM code — no Spark session needed. Checked
  * against the O(n²) DFT definition directly, not against itself. */
class FftSpec extends AnyFunSuite {

  private def naiveDftMag(x: Array[Int]): Array[Double] = {
    val n = x.length
    Array.tabulate(n / 2 + 1) { k =>
      var re = 0.0
      var im = 0.0
      var i = 0
      while (i < n) {
        val a = -2.0 * math.Pi * k * i / n
        re += x(i) * math.cos(a)
        im += x(i) * math.sin(a)
        i += 1
      }
      math.hypot(re, im)
    }
  }

  test("matches the naive DFT on seeded random signals") {
    var seed = 0x12345678L
    def nxt(): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 40) % 2001).toInt - 1000
    }
    for (n <- Seq(8, 64, 256)) {
      val x = Array.fill(n)(nxt())
      val fast = Fft.magnitudes(x)
      val slow = naiveDftMag(x)
      assert(fast.length == slow.length)
      for (k <- fast.indices)
        assert(math.abs(fast(k) - slow(k)) < 1e-6 * (1 + slow(k)),
          s"n=$n bin $k: fft ${fast(k)} vs dft ${slow(k)}")
    }
  }

  test("impulse has a flat spectrum; DC of a constant is n*c") {
    val imp = Fft.magnitudes(Array(1, 0, 0, 0, 0, 0, 0, 0))
    imp.foreach(m => assert(math.abs(m - 1.0) < 1e-12))
    val const = Fft.magnitudes(Array.fill(16)(7))
    assert(math.abs(const(0) - 112.0) < 1e-9)
    const.drop(1).foreach(m => assert(math.abs(m) < 1e-9))
  }

  test("Parseval: sum(x^2) equals mean(|X|^2) over the full spectrum") {
    val x = Array.tabulate(64)(i => (i * 37 % 101) - 50)
    val n = x.length
    val re = x.map(_.toDouble)
    val im = new Array[Double](n)
    Fft.transform(re, im)
    val lhs = x.map(v => v.toDouble * v).sum
    val rhs = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(lhs - rhs) < 1e-6 * lhs)
  }

  test("the two-tone fixture's closed-form lines hold exactly") {
    // x[i] = a1*(-1)^i + a2*q(i), q = {0,1,0,-1} cycling: lines only
    // at n/2 (a1*n) and n/4 (a2*n/2) — the multimodal_audio_fft
    // oracle's arithmetic, pinned here against the real FFT
    val (n, a1, a2) = (128, 23, 41)
    def q(i: Int) = (i % 4) match { case 1 => 1; case 3 => -1; case _ => 0 }
    val x = Array.tabulate(n)(i =>
      a1 * (if ((i & 1) == 0) 1 else -1) + a2 * q(i))
    val mags = Fft.magnitudes(x)
    assert(math.abs(mags(n / 2) - a1 * n) < 1e-7)
    assert(math.abs(mags(n / 4) - a2 * n / 2.0) < 1e-7)
    for (k <- mags.indices if k != n / 2 && k != n / 4)
      assert(math.abs(mags(k)) < 1e-7, s"bin $k leaked ${mags(k)}")
    // energy closed form
    val energy = x.map(v => v.toLong * v).sum
    assert(energy == (n / 4).toLong * (4 * a1 * a1 + 2 * a2 * a2))
  }

  test("non-power-of-two lengths fail loudly") {
    intercept[IllegalArgumentException](
      Fft.magnitudes(Array(1, 2, 3)))
  }
}
