package graft.multimodal

/** Iterative radix-2 Cooley–Tukey FFT — pure JVM, double precision, no
  * dependencies. ~50 lines because the multimodal path only needs forward
  * transforms of power-of-two windows; anything fancier (split-radix,
  * real-input halving, SIMD) buys constants we don't need at a few thousand
  * samples per clip.
  *
  * Used by [[Multimodal.audioSpectral]] for per-clip spectral features.
  * Spec'd against the O(n²) DFT definition on random inputs and against
  * analytically-known spectra (impulse, DC, exact-bin tones).
  */
object Fft {

  /** In-place forward FFT of the complex signal (re, im). Length must be a
    * power of two (≥ 1). Sign convention: X_k = Σ_n x_n · e^(-2πi·kn/N). */
  def transform(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "Fft.transform: re/im length mismatch")
    require(n >= 1 && (n & (n - 1)) == 0, "Fft.transform: length must be a power of two")
    // bit-reversal permutation
    var i = 1
    var j = 0
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
    // butterfly passes
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val i0 = blk + k
          val i1 = i0 + len / 2
          val tr = re(i1) * cr - im(i1) * ci
          val ti = re(i1) * ci + im(i1) * cr
          re(i1) = re(i0) - tr
          im(i1) = im(i0) - ti
          re(i0) += tr
          im(i0) += ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Magnitude spectrum |X_k| for k = 0..n/2 (DC through Nyquist) of a
    * real signal; the input window is NOT modified. */
  def magnitudes(samples: Array[Double]): Array[Double] = {
    val n = samples.length
    val re = java.util.Arrays.copyOf(samples, n)
    val im = new Array[Double](n)
    transform(re, im)
    Array.tabulate(n / 2 + 1)(k => math.sqrt(re(k) * re(k) + im(k) * im(k)))
  }
}
