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

  test("truncation and a bad magic fail loudly") {
    val bytes = Wav.encodePcm16(10, _ => 5)
    intercept[IllegalArgumentException] {
      Wav.decodePcm16(bytes.take(bytes.length - 3))
    }
    val bad = bytes.clone(); bad(8) = 'X'.toByte
    intercept[IllegalArgumentException] { Wav.decodePcm16(bad) }
  }
}
