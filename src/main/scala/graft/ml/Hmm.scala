package graft.ml

/** Gaussian hidden Markov model for REGIME DETECTION (Hamilton 1989's
  * Markov-switching view of commodity/financial series; Rabiner 1989 for
  * the algorithms): k hidden states, each emitting N(μ_i, σ²_i), trained
  * by Baum–Welch EM with scaled forward–backward, decoded by Viterbi.
  *
  * Execution shape (the SARIMAX/GARCH posture): the recursions are
  * inherently sequential in t and run on the AGGREGATE-SIZED driver
  * series the distributed collapse produced; the 100 TB work is the
  * collapse. Deterministic: moment-spread initialization (state means at
  * μ ± (i-offset)·σ, uniform-ish sticky transitions), fixed iteration
  * budget, no RNG.
  */
object Hmm {

  final case class Fit(pi: Array[Double], trans: Array[Array[Double]],
                       means: Array[Double], vars: Array[Double],
                       logLik: Double, iters: Int)

  private val MinVar = 1e-12

  private def gaussLogPdf(x: Double, mean: Double, v: Double): Double =
    -0.5 * (math.log(2 * math.Pi * v) + (x - mean) * (x - mean) / v)

  /** Scaled forward–backward pass. Returns (gamma, xiSum, logLik):
    * gamma(t)(i) = P(state_t = i | x), xiSum(i)(j) = Σ_t ξ_t(i,j). */
  def forwardBackward(x: Array[Double], pi: Array[Double],
                      a: Array[Array[Double]], means: Array[Double],
                      vars: Array[Double]): (Array[Array[Double]], Array[Array[Double]], Double) = {
    val n = x.length; val k = pi.length
    val b = Array.tabulate(n, k)((t, i) => math.exp(gaussLogPdf(x(t), means(i), vars(i))))
    val alpha = Array.ofDim[Double](n, k)
    val beta = Array.ofDim[Double](n, k)
    val scale = new Array[Double](n)
    // forward with per-step normalization
    var s0 = 0.0
    for (i <- 0 until k) { alpha(0)(i) = pi(i) * b(0)(i); s0 += alpha(0)(i) }
    scale(0) = math.max(s0, Double.MinPositiveValue)
    for (i <- 0 until k) alpha(0)(i) /= scale(0)
    for (t <- 1 until n) {
      var st = 0.0
      for (j <- 0 until k) {
        var acc = 0.0
        for (i <- 0 until k) acc += alpha(t - 1)(i) * a(i)(j)
        alpha(t)(j) = acc * b(t)(j); st += alpha(t)(j)
      }
      scale(t) = math.max(st, Double.MinPositiveValue)
      for (j <- 0 until k) alpha(t)(j) /= scale(t)
    }
    // backward with the same scales
    for (i <- 0 until k) beta(n - 1)(i) = 1.0
    for (t <- n - 2 to 0 by -1) {
      for (i <- 0 until k) {
        var acc = 0.0
        for (j <- 0 until k) acc += a(i)(j) * b(t + 1)(j) * beta(t + 1)(j)
        beta(t)(i) = acc / scale(t + 1)
      }
    }
    val gamma = Array.tabulate(n, k) { (t, i) =>
      val g = alpha(t)(i) * beta(t)(i)
      g
    }
    // normalize gamma rows (alpha is scaled so alpha·beta already sums
    // to ~1; renormalize to kill residual drift)
    for (t <- 0 until n) {
      val s = gamma(t).sum
      if (s > 0) for (i <- 0 until k) gamma(t)(i) /= s
    }
    val xi = Array.ofDim[Double](k, k)
    for (t <- 0 until n - 1) {
      var s = 0.0
      val cell = Array.ofDim[Double](k, k)
      for (i <- 0 until k; j <- 0 until k) {
        cell(i)(j) = alpha(t)(i) * a(i)(j) * b(t + 1)(j) * beta(t + 1)(j)
        s += cell(i)(j)
      }
      if (s > 0) for (i <- 0 until k; j <- 0 until k) xi(i)(j) += cell(i)(j) / s
    }
    val ll = scale.map(math.log).sum
    (gamma, xi, ll)
  }

  /** Baum–Welch EM from a deterministic moment-spread start. */
  def fit(x: Array[Double], k: Int = 2, maxIter: Int = 100,
          tol: Double = 1e-8): Fit = {
    require(x.length >= 10 * k, s"series too short for a $k-state HMM: ${x.length}")
    val n = x.length
    val mu = x.sum / n
    val sd = math.sqrt(math.max(x.map(v => (v - mu) * (v - mu)).sum / n, MinVar))
    var means = Array.tabulate(k)(i => mu + sd * (2.0 * i - (k - 1)) / k)
    var vars = Array.fill(k)(sd * sd)
    var pi = Array.fill(k)(1.0 / k)
    var a = Array.tabulate(k, k)((i, j) => if (i == j) 0.9 else 0.1 / (k - 1))
    var prevLl = Double.NegativeInfinity
    var it = 0
    var done = false
    var ll = prevLl
    while (it < maxIter && !done) {
      val (gamma, xi, curLl) = forwardBackward(x, pi, a, means, vars)
      ll = curLl
      // M step
      pi = gamma(0).clone()
      val gSum = Array.tabulate(k)(i => (0 until n - 1).map(gamma(_)(i)).sum)
      a = Array.tabulate(k, k) { (i, j) =>
        if (gSum(i) > 0) xi(i)(j) / gSum(i) else if (i == j) 1.0 else 0.0 }
      val gAll = Array.tabulate(k)(i => (0 until n).map(gamma(_)(i)).sum)
      means = Array.tabulate(k) { i =>
        if (gAll(i) > 0) (0 until n).map(t => gamma(t)(i) * x(t)).sum / gAll(i)
        else means(i) }
      vars = Array.tabulate(k) { i =>
        if (gAll(i) > 0)
          math.max((0 until n).map(t =>
            gamma(t)(i) * (x(t) - means(i)) * (x(t) - means(i))).sum / gAll(i), MinVar)
        else vars(i) }
      if (curLl - prevLl < tol && it > 0) done = true
      prevLl = curLl
      it += 1
    }
    Fit(pi, a, means, vars, ll, it)
  }

  /** Viterbi decode (log space) — the MAP state path. Ties break toward
    * the lower state index (deterministic). */
  def viterbi(x: Array[Double], f: Fit): Array[Int] = {
    val n = x.length; val k = f.pi.length
    val logA = f.trans.map(_.map(p => math.log(math.max(p, 1e-300))))
    val delta = Array.ofDim[Double](n, k)
    val psi = Array.ofDim[Int](n, k)
    for (i <- 0 until k)
      delta(0)(i) = math.log(math.max(f.pi(i), 1e-300)) +
        gaussLogPdf(x(0), f.means(i), f.vars(i))
    for (t <- 1 until n; j <- 0 until k) {
      var best = Double.NegativeInfinity; var arg = 0
      for (i <- 0 until k) {
        val v = delta(t - 1)(i) + logA(i)(j)
        if (v > best) { best = v; arg = i }
      }
      delta(t)(j) = best + gaussLogPdf(x(t), f.means(j), f.vars(j))
      psi(t)(j) = arg
    }
    val path = new Array[Int](n)
    var bestLast = Double.NegativeInfinity
    for (i <- 0 until k) if (delta(n - 1)(i) > bestLast) {
      bestLast = delta(n - 1)(i); path(n - 1) = i
    }
    for (t <- n - 2 to 0 by -1) path(t) = psi(t + 1)(path(t + 1))
    path
  }
}
