package graft.engine

/** Iterative radix-2 decimation-in-time FFT (power-of-2 lengths) —
  * the spectral half of the multimodal audio family
  * (`multimodal_audio_fft`): real PCM samples in, complex spectrum
  * out, O(n log n), pure JVM (the mapPartitions codec posture —
  * per-row local work, nothing leaves the executor). Written from the
  * textbook Cooley–Tukey form: bit-reversal permutation, then
  * log2(n) butterfly stages with per-stage twiddle recurrence. */
object Fft {

  /** In-place FFT over (re, im); n must be a power of two. */
  def transform(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "fft: re/im length mismatch")
    require(n > 0 && (n & (n - 1)) == 0, s"fft: length $n not a power of 2")
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterfly stages
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + len / 2); val vi0 = im(base + k + len / 2)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Magnitude spectrum of a real signal: |X[k]| for k = 0..n/2
    * (the one-sided spectrum a real input determines). */
  def magnitudes(samples: Array[Int]): Array[Double] = {
    val n = samples.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) { re(i) = samples(i).toDouble; i += 1 }
    transform(re, im)
    Array.tabulate(n / 2 + 1)(k => math.hypot(re(k), im(k)))
  }
}
