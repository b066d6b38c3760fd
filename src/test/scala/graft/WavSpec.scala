package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Wav

class WavSpec extends AnyFunSuite {

  test("encode/decode round-trip recovers fmt fields and sample digest") {
    val m = Wav.decodePcm16(Wav.encodePcm16(100, i => i * 13 - 600))
    assert(m.audioFormat == 1 && m.channels == 1 &&
      m.sampleRate == 8000 && m.bitsPerSample == 16)
    assert(m.nChunks == 2 && m.nSamples == 100)
    assert(m.sumAbs == (0 until 100).map(i => math.abs(i * 13 - 600)).sum)
  }

  test("int16 extremes round-trip through two's complement") {
    val m = Wav.decodePcm16(Wav.encodePcm16(4,
      Array(-32768, 32767, -1, 0)(_)))
    assert(m.sumAbs == 32768L + 32767 + 1)
  }

  test("sample readback matches the encoder input exactly") {
    val gen = (i: Int) => i * 13 - 600
    val smp = Wav.decodePcm16Samples(Wav.encodePcm16(100, gen))
    assert(smp.length == 100)
    assert(smp.toSeq == (0 until 100).map(gen))
    // consistency with the digest decoder
    val m = Wav.decodePcm16(Wav.encodePcm16(100, gen))
    assert(smp.map(s => math.abs(s.toLong)).sum == m.sumAbs)
    intercept[IllegalArgumentException] {
      Wav.decodePcm16Samples("RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
  }


  test("fuzz: corrupted streams fail cleanly, never uncontrolled") {
    // untrusted-byte posture (the JpegSpec fuzz, same LCG): every
    // mutation either decodes (a data flip that still passes CRC is
    // impossible here, but header-area no-ops exist) or throws the
    // decoder's own IllegalArgumentException — never an uncontrolled
    // ArrayIndexOutOfBounds / NegativeArraySize / infinite loop.
    val base = Wav.encodePcm16(200, i => i * 13 - 600)
    var seed = 0x9e3779b97f4a7c15L
    def nxt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    var outcomes = 0
    for (_ <- 0 until 1000) {
      val b = base.clone()
      val flips = 1 + nxt(3)
      for (_ <- 0 until flips) b(nxt(b.length)) = nxt(256).toByte
      try { Wav.decodePcm16Samples(b); outcomes += 1 }
      catch { case _: IllegalArgumentException => outcomes += 1 }
    }
    assert(outcomes == 1000)
  }

  test("truncation and a bad magic fail loudly") {
    val bytes = Wav.encodePcm16(10, _ => 5)
    intercept[IllegalArgumentException] {
      Wav.decodePcm16(bytes.take(bytes.length - 3))
    }
    val bad = bytes.clone(); bad(8) = 'X'.toByte
    intercept[IllegalArgumentException] { Wav.decodePcm16(bad) }
  }
  test("stereo: interleaved roundtrip, frame count, channel split") {
    def l(i: Int) = (i * 37 - 500) % 30000
    def r(i: Int) = (i * 91 + 250) % 30000
    val blob = Wav.encodePcm16Stereo(100, l, r)
    val m = Wav.decodePcm16(blob)
    assert(m.channels == 2 && m.bitsPerSample == 16)
    assert(m.nSamples == 100, "nSamples is the FRAME count")
    val want = (0 until 100).map(i =>
      math.abs(l(i).toLong) + math.abs(r(i).toLong)).sum
    assert(m.sumAbs == want)
    val inter = Wav.decodePcm16Samples(blob)
    assert(inter.length == 200)
    assert(inter(0) == l(0) && inter(1) == r(0) &&
           inter(2) == l(1) && inter(3) == r(1))
    val ch = Wav.deinterleave(inter, 2)
    assert(ch(0).toSeq == (0 until 100).map(l))
    assert(ch(1).toSeq == (0 until 100).map(r))
  }

  test("stereo data length must be frame-aligned") {
    val blob = Wav.encodePcm16Stereo(10, _ => 1, _ => 2)
    // truncate the data chunk by one SAMPLE (2 bytes): still
    // 2-byte-aligned, but no longer a whole stereo frame
    val cut = blob.dropRight(2).clone()
    // patch RIFF size and data length down by 2
    def patchLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
      b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
    }
    patchLe32(cut, 4, cut.length - 8)
    patchLe32(cut, 40, 4 * 10 - 2)
    val e = intercept[IllegalArgumentException](Wav.decodePcm16(cut))
    assert(e.getMessage.contains("frame-aligned"), e.getMessage)
  }

}
