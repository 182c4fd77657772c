package graft.ml

/** GARCH(1,1) volatility estimation by exact maximum likelihood — the
  * conditional-heteroskedasticity model every commodity-return study fits
  * next to its ARIMA mean model (Bollerslev 1986; the reference's domain
  * is commodity price analytics, where volatility clustering is the
  * defining stylized fact the homoskedastic SARIMAX residual assumption
  * misses).
  *
  * Model, on a demeaned return series r_t:
  *   σ²_t = ω + α·r²_{t−1} + β·σ²_{t−1},   σ²_1 = sample variance,
  * with ω > 0, α ≥ 0, β ≥ 0, α + β < 1 (covariance stationarity).
  * Gaussian log-likelihood (constant dropped, as statsmodels/arch do for
  * optimization; reported WITH the constant):
  *   ℓ = −½ Σ (ln σ²_t + r²_t/σ²_t) − (n/2)·ln 2π.
  *
  * Estimation: Nelder–Mead simplex over θ = (ln ω, ln α, ln β) — the log
  * transform enforces positivity; the stationarity boundary α + β < 1 is
  * an infeasibility penalty. Started from variance targeting (α=0.05,
  * β=0.90, ω=(1−α−β)·Var[r]). Deterministic: fixed start, fixed simplex
  * scale, fixed iteration budget — no RNG anywhere.
  *
  * Execution shape (the SARIMAX posture, `ml/Sarimax.scala`): the fit
  * consumes an AGGREGATE-SIZED series the distributed stage produced
  * (30-minute bucket collapse of the fact table) — model-sized driver
  * state; the 100 TB work is the collapse, not the recursion, which is
  * inherently sequential in t (σ²_t depends on σ²_{t−1}).
  */
object Garch {

  final case class Fit(omega: Double, alpha: Double, beta: Double,
                       logLik: Double, n: Int) {
    def persistence: Double = alpha + beta
    /** Unconditional (long-run) variance ω/(1−α−β). */
    def uncondVar: Double = omega / (1.0 - alpha - beta)
    def aic: Double = -2.0 * logLik + 2.0 * 3
  }

  /** Negative log-likelihood (with the 2π constant) of GARCH(1,1) params
    * on the demeaned series; Double.MaxValue outside the feasible set. */
  def negLogLik(r: Array[Double], omega: Double, alpha: Double,
                beta: Double): Double = {
    if (!(omega > 0) || alpha < 0 || beta < 0 || alpha + beta >= 1.0)
      return Double.MaxValue
    val n = r.length
    var s2 = sampleVar(r)
    var acc = 0.0
    var t = 0
    while (t < n) {
      if (t > 0) s2 = omega + alpha * r(t - 1) * r(t - 1) + beta * s2
      if (s2 <= 0 || s2.isNaN) return Double.MaxValue
      acc += math.log(s2) + r(t) * r(t) / s2
      t += 1
    }
    0.5 * acc + 0.5 * n * math.log(2 * math.Pi)
  }

  /** The in-sample conditional-variance path at given params. */
  def variancePath(r: Array[Double], omega: Double, alpha: Double,
                   beta: Double): Array[Double] = {
    val out = new Array[Double](r.length)
    var s2 = sampleVar(r)
    var t = 0
    while (t < r.length) {
      if (t > 0) s2 = omega + alpha * r(t - 1) * r(t - 1) + beta * s2
      out(t) = s2
      t += 1
    }
    out
  }

  def sampleVar(r: Array[Double]): Double = {
    val n = r.length
    var s = 0.0; var ss = 0.0
    var i = 0
    while (i < n) { s += r(i); ss += r(i) * r(i); i += 1 }
    (ss - s * s / n) / n
  }

  /** ORACLE-GRADE fit (r16, the `ml_garch` conversion): the same
    * Nelder–Mead, but every vertex coordinate is re-gridded to 1e-9
    * and every objective value to 1e-6 before ANY comparison — so the
    * simplex path is a sequence of DISCRETE states both engines replay
    * exactly (the cross-engine libm differences in exp/ln perturb
    * objective values at ~1e-12, absorbed by the 1e-6 grid; branch
    * decisions, the stable (value, index) sort and the stopping rule
    * all ride gridded values — the `ml_changepoint_pelt` argmin
    * discipline applied to a simplex). Infeasible/overflowing points
    * take the grid-safe sentinel 1e18 instead of Double.MaxValue. The
    * full-precision [[fit]] stays the library surface. */
  def fitGridded(r: Array[Double]): Fit = {
    require(r.length >= 20, s"series too short for a GARCH fit: ${r.length}")
    // the house re-grid (shortest-string HALF_UP == both engines' round)
    def r9(x: Double) = graft.queries.Grid.r9(x)
    def r6(x: Double) = graft.queries.Grid.r6(x)
    val v = sampleVar(r)
    val (a0, b0) = (0.05, 0.90)
    val start = Array(r9(math.log((1 - a0 - b0) * v)), r9(math.log(a0)),
      r9(math.log(b0)))
    def obj(th: Array[Double]): Double = {
      val nll = negLogLik(r, math.exp(th(0)), math.exp(th(1)), math.exp(th(2)))
      if (nll >= 1e18 || !java.lang.Double.isFinite(nll)) 1e18 else r6(nll)
    }
    val best = nelderMeadGridded(obj, start, step = 0.5, maxIter = 600)
    val (w, a, b) = (math.exp(best(0)), math.exp(best(1)), math.exp(best(2)))
    Fit(w, a, b, -negLogLik(r, w, a, b), r.length)
  }

  /** [[nelderMead]] with every candidate coordinate re-gridded 1e-9
    * (the objective is expected to be pre-gridded by the caller) and
    * the vertex sort made EXPLICITLY stable on (value, index) — the
    * exact order a SQL `list_sort` over (f, pos) structs replays. */
  def nelderMeadGridded(f: Array[Double] => Double, x0: Array[Double],
                        step: Double, maxIter: Int): Array[Double] = {
    def r9(x: Double) = graft.queries.Grid.r9(x)
    val dim = x0.length
    var simplex = (x0 +: Array.tabulate(dim) { i =>
      val p = x0.clone(); p(i) = r9(p(i) + step); p
    }.toSeq).map(p => (p, f(p))).toArray
    var it = 0
    while (it < maxIter && {
      val vals = simplex.map(_._2)
      vals.max - vals.min > 0.0
    }) {
      simplex = simplex.zipWithIndex
        .sortBy { case ((_, fv), idx) => (fv, idx) }.map(_._1)
      val worst = simplex(dim)._1
      val centroid = Array.tabulate(dim) { j =>
        r9(simplex.take(dim).map(_._1(j)).sum / dim) }
      def at(c: Double) = Array.tabulate(dim)(j =>
        r9(centroid(j) + c * (centroid(j) - worst(j))))
      val xr = at(1.0); val fr = f(xr)
      if (fr < simplex(0)._2) {
        val xe = at(2.0); val fe = f(xe)
        simplex(dim) = if (fe < fr) (xe, fe) else (xr, fr)
      } else if (fr < simplex(dim - 1)._2) {
        simplex(dim) = (xr, fr)
      } else {
        val xc = at(-0.5); val fc = f(xc)
        if (fc < simplex(dim)._2) simplex(dim) = (xc, fc)
        else {
          val bestP = simplex(0)._1
          var i = 1
          while (i <= dim) {
            val p = Array.tabulate(dim)(j =>
              r9(bestP(j) + 0.5 * (simplex(i)._1(j) - bestP(j))))
            simplex(i) = (p, f(p))
            i += 1
          }
        }
      }
      it += 1
    }
    simplex.zipWithIndex
      .sortBy { case ((_, fv), idx) => (fv, idx) }.map(_._1).head._1
  }

  /** MLE via deterministic Nelder–Mead in (ln ω, ln α, ln β) space.
    * `r` must already be demeaned. */
  def fit(r: Array[Double]): Fit = {
    require(r.length >= 20, s"series too short for a GARCH fit: ${r.length}")
    val v = sampleVar(r)
    val (a0, b0) = (0.05, 0.90)
    val start = Array(math.log((1 - a0 - b0) * v), math.log(a0), math.log(b0))
    def obj(th: Array[Double]): Double =
      negLogLik(r, math.exp(th(0)), math.exp(th(1)), math.exp(th(2)))
    val best = nelderMead(obj, start, step = 0.5, maxIter = 600)
    val (w, a, b) = (math.exp(best(0)), math.exp(best(1)), math.exp(best(2)))
    Fit(w, a, b, -negLogLik(r, w, a, b), r.length)
  }

  /** Textbook Nelder–Mead (α=1, γ=2, ρ=0.5, σ=0.5), deterministic
    * initial simplex (coordinate steps of `step`), ties broken by
    * vertex index. Converges when the simplex's objective spread falls
    * below 1e-10 or the iteration budget runs out. */
  def nelderMead(f: Array[Double] => Double, x0: Array[Double],
                 step: Double, maxIter: Int): Array[Double] = {
    val dim = x0.length
    var simplex = (x0 +: Array.tabulate(dim) { i =>
      val p = x0.clone(); p(i) += step; p
    }.toSeq).map(p => (p, f(p))).toArray
    var it = 0
    while (it < maxIter && {
      val vals = simplex.map(_._2)
      vals.max - vals.min > 1e-10
    }) {
      simplex = simplex.sortBy(_._2)
      val worst = simplex(dim)._1
      val centroid = Array.tabulate(dim) { j =>
        simplex.take(dim).map(_._1(j)).sum / dim }
      def at(c: Double) = Array.tabulate(dim)(j =>
        centroid(j) + c * (centroid(j) - worst(j)))
      val xr = at(1.0); val fr = f(xr)
      if (fr < simplex(0)._2) {
        val xe = at(2.0); val fe = f(xe)
        simplex(dim) = if (fe < fr) (xe, fe) else (xr, fr)
      } else if (fr < simplex(dim - 1)._2) {
        simplex(dim) = (xr, fr)
      } else {
        val xc = at(-0.5); val fc = f(xc)
        if (fc < simplex(dim)._2) simplex(dim) = (xc, fc)
        else {
          // shrink toward the best vertex
          val bestP = simplex(0)._1
          var i = 1
          while (i <= dim) {
            val p = Array.tabulate(dim)(j =>
              bestP(j) + 0.5 * (simplex(i)._1(j) - bestP(j)))
            simplex(i) = (p, f(p))
            i += 1
          }
        }
      }
      it += 1
    }
    simplex.minBy(_._2)._1
  }
}
