package graft

import graft.ops.Fft
import org.scalatest.funsuite.AnyFunSuite

/** FFT correctness (SURVEY.md §5): closed forms, Parseval, linearity,
  * round-trip, and agreement with the O(n²) DFT — covering both the
  * radix-2 path (n = 2^k) and the Bluestein path (arbitrary n, incl.
  * the reference's n=200). */
class FftSpec extends AnyFunSuite {

  private def maxErr(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => math.abs(a(i) - b(i))).maxOption.getOrElse(0.0)

  test("impulse: FFT(δ) is all-ones") {
    for (n <- Seq(8, 200, 37)) {
      val x = Array.fill(n)(0.0); x(0) = 1.0
      val (re, im) = Fft.fftReal(x.toSeq)
      assert(re.forall(v => math.abs(v - 1.0) < 1e-9))
      assert(im.forall(v => math.abs(v) < 1e-9))
    }
  }

  test("constant: FFT(1) = n·δ") {
    for (n <- Seq(16, 200, 51)) {
      val (re, im) = Fft.fftReal(Seq.fill(n)(1.0))
      assert(math.abs(re(0) - n) < 1e-9)
      assert(re.drop(1).forall(v => math.abs(v) < 1e-7))
      assert(im.forall(v => math.abs(v) < 1e-7))
    }
  }

  test("single tone: cos(2πkt/n) has spikes n/2 at ±k") {
    val n = 200; val k = 7
    val x = (0 until n).map(t => math.cos(2 * math.Pi * k * t / n))
    val mag = Fft.magnitude(x)
    assert(math.abs(mag(k) - n / 2.0) < 1e-7)
    assert(math.abs(mag(n - k) - n / 2.0) < 1e-7)
    assert(mag.zipWithIndex.filterNot(p => p._2 == k || p._2 == n - k)
      .forall(_._1 < 1e-7))
  }

  test("agrees with O(n²) DFT on random input (pow2 and Bluestein)") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 2, 3, 4, 5, 16, 31, 64, 100, 200, 255)) {
      val x = Seq.fill(n)(rnd.nextDouble() * 2 - 1)
      val (fr, fi) = Fft.fftReal(x)
      val (dr, di) = Fft.dft(x)
      assert(maxErr(fr, dr) < 1e-7 * n, s"re mismatch at n=$n")
      assert(maxErr(fi, di) < 1e-7 * n, s"im mismatch at n=$n")
    }
  }

  test("Parseval: Σ|X|² = n·Σ|x|² (100 random sizes/inputs)") {
    val rnd = new scala.util.Random(123)
    for (_ <- 1 to 100) {
      val n = 1 + rnd.nextInt(128)
      val x = Seq.fill(n)(rnd.nextDouble() * 20 - 10)
      val mag = Fft.magnitude(x)
      val lhs = mag.map(m => m * m).sum
      val rhs = n * x.map(v => v * v).sum
      assert(math.abs(lhs - rhs) <= 1e-7 * math.max(1.0, rhs), s"n=$n")
    }
  }

  test("linearity: FFT(ax + by) = a·FFT(x) + b·FFT(y)") {
    val rnd = new scala.util.Random(7)
    val n = 96 // non-pow2 → Bluestein
    val x = Seq.fill(n)(rnd.nextDouble()); val y = Seq.fill(n)(rnd.nextDouble())
    val (a, b) = (2.5, -1.25)
    val combined = x.zip(y).map { case (u, v) => a * u + b * v }
    val (cr, ci) = Fft.fftReal(combined)
    val (xr, xi) = Fft.fftReal(x); val (yr, yi) = Fft.fftReal(y)
    val er = xr.zip(yr).map { case (u, v) => a * u + b * v }
    val ei = xi.zip(yi).map { case (u, v) => a * u + b * v }
    assert(maxErr(cr, er.toArray) < 1e-8 * n)
    assert(maxErr(ci, ei.toArray) < 1e-8 * n)
  }

  test("round-trip: ifft(fft(x)) ≈ x") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(8, 200, 77)) {
      val x = Array.fill(n)(rnd.nextDouble() * 4 - 2)
      val (fr, fi) = Fft.fftComplex(x, new Array[Double](n), invert = false)
      val (br, bi) = Fft.fftComplex(fr, fi, invert = true)
      assert(maxErr(br, x) < 1e-8 * n)
      assert(bi.forall(v => math.abs(v) < 1e-7))
    }
  }

  test("empty and singleton") {
    assert(Fft.magnitude(Seq.empty) == Seq.empty)
    assert(Fft.magnitude(Seq(3.5)) == Seq(3.5))
  }
}
