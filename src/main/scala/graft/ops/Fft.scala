package graft.ops

/** FFT (SURVEY.md §2.6 W3 — `torch.fft.fft` at `TS_CPC.py:70-71`,
  * `S_CPC.py:69-70`): hand-written, dependency-free (offline build).
  *
  * Iterative radix-2 Cooley-Tukey for power-of-two sizes; Bluestein's
  * chirp-z algorithm for arbitrary n (reference n=200 = 2³·5²; testdata
  * series have arbitrary lengths). Correctness is pinned by FftSpec:
  * impulse/constant/single-tone closed forms, Parseval, linearity,
  * ifft∘fft ≈ id, and agreement with the O(n²) DFT.
  *
  * The ONLY column-level surface is the native Catalyst expression
  * `graft_fft_mag` (expr/FftMagExpr — codegen, no UDF boundary), which
  * calls this kernel statically. Sequences are bounded (reference:
  * 200), so per-row cost is O(n log n) and the operator scales
  * linearly with rows, no shuffle.
  */
object Fft {

  /** in-place iterative radix-2 Cooley-Tukey; n must be a power of 2. */
  private def fftPow2(re: Array[Double], im: Array[Double],
                      invert: Boolean): Unit = {
    val n = re.length
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
    var len = 2
    while (len <= n) {
      val ang = 2 * math.Pi / len * (if (invert) 1 else -1)
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0
        var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val xr = re(base + k + len / 2); val xi = im(base + k + len / 2)
          val vr = xr * cwr - xi * cwi
          val vi = xr * cwi + xi * cwr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
    if (invert) {
      var p = 0
      while (p < n) { re(p) /= n; im(p) /= n; p += 1 }
    }
  }

  private def isPow2(n: Int): Boolean = n > 0 && (n & (n - 1)) == 0

  private def nextPow2(n: Int): Int = {
    var m = 1
    while (m < n) m <<= 1
    m
  }

  /** Bluestein chirp-z: DFT of arbitrary n via one power-of-two
    * convolution of size ≥ 2n−1. */
  private def bluestein(re: Array[Double], im: Array[Double],
                        invert: Boolean): (Array[Double], Array[Double]) = {
    val n = re.length
    val m = nextPow2(2 * n - 1)
    val sign = if (invert) 1.0 else -1.0
    // chirp w_k = exp(sign·iπk²/n); k² mod 2n avoids precision loss
    val cr = new Array[Double](n)
    val ci = new Array[Double](n)
    var k = 0
    while (k < n) {
      val kk = (k.toLong * k) % (2L * n)
      val ang = math.Pi * kk / n * sign
      cr(k) = math.cos(ang); ci(k) = math.sin(ang)
      k += 1
    }
    val ar = new Array[Double](m); val ai = new Array[Double](m)
    k = 0
    while (k < n) {
      ar(k) = re(k) * cr(k) - im(k) * ci(k)
      ai(k) = re(k) * ci(k) + im(k) * cr(k)
      k += 1
    }
    val br = new Array[Double](m); val bi = new Array[Double](m)
    br(0) = cr(0); bi(0) = -ci(0)
    k = 1
    while (k < n) {
      br(k) = cr(k); bi(k) = -ci(k)
      br(m - k) = cr(k); bi(m - k) = -ci(k)
      k += 1
    }
    fftPow2(ar, ai, invert = false)
    fftPow2(br, bi, invert = false)
    k = 0
    while (k < m) {
      val r = ar(k) * br(k) - ai(k) * bi(k)
      ai(k) = ar(k) * bi(k) + ai(k) * br(k)
      ar(k) = r
      k += 1
    }
    fftPow2(ar, ai, invert = true)
    val or_ = new Array[Double](n); val oi = new Array[Double](n)
    k = 0
    while (k < n) {
      or_(k) = ar(k) * cr(k) - ai(k) * ci(k)
      oi(k) = ar(k) * ci(k) + ai(k) * cr(k)
      if (invert) { or_(k) /= n; oi(k) /= n }
      k += 1
    }
    (or_, oi)
  }

  /** forward FFT of a real sequence → (re, im). */
  def fftReal(x: Seq[Double]): (Array[Double], Array[Double]) = {
    val re = x.toArray
    val im = new Array[Double](re.length)
    fftComplex(re, im, invert = false)
  }

  /** forward/inverse FFT of a complex sequence; inputs untouched. */
  def fftComplex(reIn: Array[Double], imIn: Array[Double],
                 invert: Boolean): (Array[Double], Array[Double]) = {
    val n = reIn.length
    if (n == 0) (Array.empty, Array.empty)
    else if (isPow2(n)) {
      val re = reIn.clone(); val im = imIn.clone()
      fftPow2(re, im, invert)
      (re, im)
    } else bluestein(reIn, imIn, invert)
  }

  /** reference O(n²) DFT — test oracle for the fast paths. */
  def dft(x: Seq[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n); val im = new Array[Double](n)
    var k = 0
    while (k < n) {
      var j = 0
      var sr = 0.0; var si = 0.0
      while (j < n) {
        val ang = -2 * math.Pi * k * j / n
        sr += x(j) * math.cos(ang)
        si += x(j) * math.sin(ang)
        j += 1
      }
      re(k) = sr; im(k) = si
      k += 1
    }
    (re, im)
  }

  /** magnitude spectrum |FFT(x)| (P13: `torch.abs(fft(x))`). */
  def magnitude(x: Seq[Double]): Seq[Double] = {
    val (re, im) = fftReal(x)
    re.indices.map(i => math.sqrt(re(i) * re(i) + im(i) * im(i)))
  }

}
