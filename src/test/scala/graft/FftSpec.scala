package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Fft

/** FFT correctness: against the O(n²) DFT definition on random input, and
  * against analytically-known spectra. */
class FftSpec extends AnyFunSuite {

  private def naiveDft(re: Array[Double], im: Array[Double]): (Array[Double], Array[Double]) = {
    val n = re.length
    val or = new Array[Double](n)
    val oi = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      or(k) += re(t) * math.cos(ang) - im(t) * math.sin(ang)
      oi(k) += re(t) * math.sin(ang) + im(t) * math.cos(ang)
    }
    (or, oi)
  }

  test("FFT equals the DFT definition on random complex input") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 2, 8, 64, 256)) {
      val re = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val im = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val (er, ei) = naiveDft(re, im)
      Fft.transform(re, im)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) < 1e-9 * n, s"n=$n k=$k re")
        assert(math.abs(im(k) - ei(k)) < 1e-9 * n, s"n=$n k=$k im")
      }
    }
  }

  test("impulse is flat, DC is concentrated, Parseval holds") {
    // impulse at 0 -> |X_k| = 1 for all k
    val mag = Fft.magnitudes(Array(1.0) ++ Array.fill(15)(0.0))
    assert(mag.forall(m => math.abs(m - 1.0) < 1e-12))
    // constant c -> X_0 = n*c exactly (integer adds), all else ~0
    val dc = Fft.magnitudes(Array.fill(32)(3.0))
    assert(dc(0) == 96.0)
    assert(dc.drop(1).forall(_ < 1e-10))
    // Parseval on random input
    val rnd = new scala.util.Random(11)
    val x = Array.fill(128)(rnd.nextDouble() * 2 - 1)
    val re = x.clone(); val im = new Array[Double](128)
    Fft.transform(re, im)
    val lhs = x.map(v => v * v).sum
    val rhs = (0 until 128).map(k => re(k) * re(k) + im(k) * im(k)).sum / 128
    assert(math.abs(lhs - rhs) < 1e-9)
  }

  test("the m8 fixture signal concentrates in exactly bins 0 and n/4, X_0 exact") {
    // samples [dc, dc+A, dc, dc-A] = dc + A·sin(πi/2): the one sinusoid
    // whose 16-bit quantization is EXACT (values are integers), making the
    // m8 formula oracle valid. X_0 = n·dc (exact), |X_{n/4}| = A·n/2.
    val n = 512; val a = 9000.0; val d = 17.0
    val sig = Array.tabulate(n)(i => i % 4 match {
      case 1 => d + a
      case 3 => d - a
      case _ => d
    })
    val mag = Fft.magnitudes(sig)
    assert(mag(0) == n * d, s"X_0 must be exact: ${mag(0)} != ${n * d}")
    assert(math.abs(mag(n / 4) - a * n / 2) < 1e-6)
    for (k <- 1 to n / 2 if k != n / 4)
      assert(mag(k) < 1e-6, s"leakage at bin $k: ${mag(k)}")
  }
}
