package graft.stats

/** Pure-Scala negative-binomial GLM kernels for the per-gene differential
  * statistics (reference SURVEY.md §2.5 D1-D3). Each gene's fit is a few
  * doubles of state over the (small) samples axis, so these run row-local
  * inside Spark map expressions — embarrassingly parallel over the 100 TB
  * genes dimension, no shuffle.
  *
  * The math follows the published DESeq2 model (Love et al. 2014): log2-link
  * NB GLM with size-factor offsets and a small ridge (1e-6) for stability;
  * dispersion estimation maximizes the Cox-Reid adjusted profile likelihood.
  * Validated against the reference's R golden values: given the same
  * dispersions, logFC/lfcSE/stat reproduce DESeq2 to 1e-6 (DESeq2Spec).
  */
object NbGlm {
  val Ln2: Double = math.log(2.0)
  val MinMu = 0.5
  val MinDisp = 1e-8

  /** Solve A·x = b for small dense systems (Gaussian elimination, partial
    * pivoting). A is row-major p×p. */
  def solve(a: Array[Double], b: Array[Double], p: Int): Array[Double] = {
    val m = a.clone(); val y = b.clone()
    var col = 0
    while (col < p) {
      var piv = col; var best = math.abs(m(col * p + col))
      var r = col + 1
      while (r < p) {
        val v = math.abs(m(r * p + col)); if (v > best) { piv = r; best = v }; r += 1
      }
      if (piv != col) {
        var k = 0
        while (k < p) {
          val t = m(col * p + k); m(col * p + k) = m(piv * p + k); m(piv * p + k) = t; k += 1
        }
        val t = y(col); y(col) = y(piv); y(piv) = t
      }
      val d = m(col * p + col)
      r = col + 1
      while (r < p) {
        val f = m(r * p + col) / d
        var k = col
        while (k < p) { m(r * p + k) -= f * m(col * p + k); k += 1 }
        y(r) -= f * y(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](p)
    var i = p - 1
    while (i >= 0) {
      var s = y(i); var k = i + 1
      while (k < p) { s -= m(i * p + k) * x(k); k += 1 }
      x(i) = s / m(i * p + i)
      i -= 1
    }
    x
  }

  /** Invert a small dense matrix (for the GLM covariance). */
  def inverse(a: Array[Double], p: Int): Array[Double] = {
    val out = new Array[Double](p * p)
    var j = 0
    while (j < p) {
      val e = new Array[Double](p); e(j) = 1.0
      val colSol = solve(a, e, p)
      var i = 0
      while (i < p) { out(i * p + j) = colSol(i); i += 1 }
      j += 1
    }
    out
  }

  final case class Fit(beta: Array[Double], mu: Array[Double], se: Array[Double])

  /** IRLS fit of the NB GLM: mu = sf · 2^(X·beta) (DESeq2 log2 scale),
    * variance mu + alpha·mu², ridge 1e-6, mu floored at 0.5. */
  def fit(y: Array[Double], sf: Array[Double], x: Array[Array[Double]],
      alpha: Double, maxIter: Int = 100, tol: Double = 1e-10): Fit = {
    val n = y.length; val p = x(0).length
    // init: least squares of log2(y/sf + 0.1)
    val q = Array.tabulate(n)(i => math.log(y(i) / sf(i) + 0.1) / Ln2)
    var beta = lstsq(x, q, n, p)
    val lam = 1e-6
    var it = 0
    var done = false
    while (it < maxIter && !done) {
      val mu = Array.tabulate(n) { i =>
        math.max(sf(i) * math.pow(2.0, dot(x(i), beta)), MinMu)
      }
      val a = new Array[Double](p * p); val b = new Array[Double](p)
      var i = 0
      while (i < n) {
        val w = mu(i) / (1.0 + alpha * mu(i)) * Ln2 * Ln2
        val z = dot(x(i), beta) + (y(i) - mu(i)) / (mu(i) * Ln2)
        var r = 0
        while (r < p) {
          b(r) += w * z * x(i)(r)
          var c = 0
          while (c < p) { a(r * p + c) += w * x(i)(r) * x(i)(c); c += 1 }
          r += 1
        }
        i += 1
      }
      var r = 0
      while (r < p) { a(r * p + r) += lam; r += 1 }
      val nb = solve(a, b, p)
      var delta = 0.0
      var k = 0
      while (k < p) { delta = math.max(delta, math.abs(nb(k) - beta(k))); k += 1 }
      beta = nb
      if (delta < tol) done = true
      it += 1
    }
    val mu = Array.tabulate(n)(i => math.max(sf(i) * math.pow(2.0, dot(x(i), beta)), MinMu))
    val a = new Array[Double](p * p)
    var i = 0
    while (i < n) {
      val w = mu(i) / (1.0 + alpha * mu(i)) * Ln2 * Ln2
      var r = 0
      while (r < p) {
        var c = 0
        while (c < p) { a(r * p + c) += w * x(i)(r) * x(i)(c); c += 1 }
        r += 1
      }
      i += 1
    }
    var r = 0
    while (r < p) { a(r * p + r) += 1e-6; r += 1 }
    val cov = inverse(a, p)
    val se = Array.tabulate(p)(j => math.sqrt(cov(j * p + j)))
    Fit(beta, mu, se)
  }

  /** NB log-likelihood (alpha = dispersion). */
  def nbLogLik(y: Array[Double], mu: Array[Double], alpha: Double): Double = {
    val ia = 1.0 / alpha
    var s = 0.0; var i = 0
    while (i < y.length) {
      val m = mu(i)
      s += Gamma.lgamma(y(i) + ia) - Gamma.lgamma(ia) - Gamma.lgamma(y(i) + 1.0) +
        y(i) * math.log(m * alpha / (1.0 + m * alpha)) - ia * math.log1p(m * alpha)
      i += 1
    }
    s
  }

  /** Cox-Reid adjustment: −½·log det(Xᵀ W X), W = mu/(1+α·mu). */
  def coxReid(mu: Array[Double], x: Array[Array[Double]], alpha: Double): Double = {
    val n = mu.length; val p = x(0).length
    val a = new Array[Double](p * p)
    var i = 0
    while (i < n) {
      val w = mu(i) / (1.0 + alpha * mu(i))
      var r = 0
      while (r < p) {
        var c = 0
        while (c < p) { a(r * p + c) += w * x(i)(r) * x(i)(c); c += 1 }
        r += 1
      }
      i += 1
    }
    -0.5 * logDet(a, p)
  }

  /** log|A| via LU (A assumed positive definite here). */
  def logDet(a0: Array[Double], p: Int): Double = {
    val m = a0.clone()
    var det = 0.0
    var col = 0
    while (col < p) {
      var piv = col; var best = math.abs(m(col * p + col))
      var r = col + 1
      while (r < p) { val v = math.abs(m(r * p + col)); if (v > best) { piv = r; best = v }; r += 1 }
      if (piv != col) {
        var k = 0
        while (k < p) { val t = m(col * p + k); m(col * p + k) = m(piv * p + k); m(piv * p + k) = t; k += 1 }
      }
      det += math.log(math.abs(m(col * p + col)))
      r = col + 1
      while (r < p) {
        val f = m(r * p + col) / m(col * p + col)
        var k = col
        while (k < p) { m(r * p + k) -= f * m(col * p + k); k += 1 }
        r += 1
      }
      col += 1
    }
    det
  }

  /** Maximize the CR-adjusted profile likelihood over log-alpha by
    * golden-section search, optionally with a normal prior on log-alpha
    * (the DESeq2 MAP step). */
  def maximizeAlpha(y: Array[Double], mu: Array[Double], x: Array[Array[Double]],
      priorMean: Double = Double.NaN, priorVar: Double = Double.NaN,
      lo: Double = math.log(MinDisp), hi: Double = math.log(10.0)): Double = {
    val usePrior = !priorMean.isNaN
    def obj(la: Double): Double = {
      val a = math.exp(la)
      var o = nbLogLik(y, mu, a) + coxReid(mu, x, a)
      if (usePrior) o -= (la - priorMean) * (la - priorMean) / (2.0 * priorVar)
      o
    }
    val gr = (math.sqrt(5.0) - 1) / 2
    var a_ = lo; var b_ = hi
    var c_ = b_ - gr * (b_ - a_); var d_ = a_ + gr * (b_ - a_)
    var fc = obj(c_); var fd = obj(d_)
    var it = 0
    while (it < 200 && math.abs(b_ - a_) > 1e-12) {
      if (fc > fd) { b_ = d_; d_ = c_; fd = fc; c_ = b_ - gr * (b_ - a_); fc = obj(c_) }
      else { a_ = c_; c_ = d_; fc = fd; d_ = a_ + gr * (b_ - a_); fd = obj(d_) }
      it += 1
    }
    math.exp((a_ + b_) / 2)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def lstsq(x: Array[Array[Double]], y: Array[Double], n: Int, p: Int): Array[Double] = {
    val a = new Array[Double](p * p); val b = new Array[Double](p)
    var i = 0
    while (i < n) {
      var r = 0
      while (r < p) {
        b(r) += x(i)(r) * y(i)
        var c = 0
        while (c < p) { a(r * p + c) += x(i)(r) * x(i)(c); c += 1 }
        r += 1
      }
      i += 1
    }
    var r = 0
    while (r < p) { a(r * p + r) += 1e-12; r += 1 }
    solve(a, b, p)
  }
}

/** Special functions (public formulas: Lanczos lgamma; AS103 digamma;
  * recurrence + asymptotic trigamma; erfc-based normal CDF). */
object Gamma {
  def lgamma(x: Double): Double = {
    // Lanczos approximation, g=7, n=9
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      math.log(math.Pi / math.sin(math.Pi * x)) - lgamma(1.0 - x)
    } else {
      val z = x - 1.0
      var s = c(0)
      var i = 1
      while (i < 9) { s += c(i) / (z + i); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(s)
    }
  }

  def trigamma(x0: Double): Double = {
    var x = x0; var s = 0.0
    while (x < 8) { s += 1.0 / (x * x); x += 1 }
    val ix = 1.0 / x
    val ix2 = ix * ix
    s + ix * (1.0 + ix * (0.5 + ix *
      (1.0 / 6 - ix2 * (1.0 / 30 - ix2 * (1.0 / 42 - ix2 / 30)))))
  }

  def digamma(x0: Double): Double = {
    var x = x0; var s = 0.0
    while (x < 8) { s -= 1.0 / x; x += 1 }
    val ix = 1.0 / x
    val ix2 = ix * ix
    s + math.log(x) - 0.5 * ix -
      ix2 * (1.0 / 12 - ix2 * (1.0 / 120 - ix2 * (1.0 / 252 - ix2 / 240)))
  }

  /** psi''(x) (tetragamma): recurrence below 6, asymptotic series above. */
  def tetragamma(x0: Double): Double = {
    var x = x0; var s = 0.0
    while (x < 6) { s -= 2.0 / (x * x * x); x += 1 }
    val ix = 1.0 / x
    val ix2 = ix * ix
    s - ix2 * (1.0 + ix * (1.0 + ix * (0.5 - ix2 * (1.0 / 6 - ix2 / 6))))
  }

  /** Solve trigamma(y) = x for y > 0 (limma::trigammaInverse — Newton on
    * the monotone decreasing trigamma with its asymptotic endpoints). */
  def trigammaInverse(x: Double): Double = {
    if (x > 1e7) return 1.0 / math.sqrt(x)
    if (x < 1e-6) return 1.0 / x
    var y = 0.5 + 1.0 / x
    var i = 0
    while (i < 50) {
      val tri = trigamma(y)
      val dif = tri * (1.0 - tri / x) / tetragamma(y)
      y += dif
      if (-dif / y < 1e-8) i = 50 else i += 1
    }
    y
  }

  /** Two-sided normal p-value for a Wald statistic: 2·Φ(−|z|) = erfc(|z|/√2). */
  def waldP(stat: Double): Double = erfc(math.abs(stat) / math.sqrt(2.0))

  /** erfc via the rational Chebyshev approximation (Numerical Recipes form,
    * |error| < 1.2e-7) refined by one continued-fraction step for small
    * arguments; adequate for p-values at 1e-6 relative accuracy. */
  def erfc(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 + t * (0.37409196 +
      t * (0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (-1.13520398 +
        t * (1.48851587 + t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) ans else 2.0 - ans
  }
}
