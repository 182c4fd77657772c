package graft.ml

import breeze.linalg.{kron, DenseMatrix, DenseVector}
import breeze.optimize.{ApproximateGradientFunction, DiffFunction, LBFGS}

/** State-space SARIMAX: exact Gaussian maximum likelihood for
  * ARIMA(p,d,q)×(P,D,Q)_s via the Kalman filter — the estimator behind the
  * reference's statsmodels `SARIMAX` usage (`Marilyn_Cleaning.ipynb:34
  * (cell 1)`; model table `Presentation.pptx` slide21–22), upgrading the
  * conditional-least-squares `ml_sarima` path with true MA terms.
  *
  * Estimation pipeline (statsmodels' `simple_differencing=True` variant):
  *  1. difference the series `z = Δ^d Δ_s^D y`;
  *  2. multiply the seasonal and non-seasonal lag polynomials into one
  *     reduced ARMA(p̄, q̄), p̄ = p + P·s, q̄ = q + Q·s ([[expandPoly]]);
  *  3. put the ARMA in the Harvey state-space form (state dim
  *     r = max(p̄, q̄+1)), exact stationary initialization from the
  *     discrete Lyapunov equation, and run the Kalman filter for the
  *     prediction-error decomposition of the likelihood with σ²
  *     concentrated out ([[filter]]);
  *  4. maximize over unconstrained parameters mapped through the
  *     Monahan/Jones PACF transform ([[constrainAr]]) so every L-BFGS
  *     iterate is stationary AND invertible — the same
  *     `enforce_stationarity`/`enforce_invertibility` device statsmodels
  *     uses.
  *
  * Scale posture: the filter is O(n·r²) and SERIAL BY NATURE — this is
  * driver-side math, exactly like statsmodels. What is distributed is
  * everything that produces the series: at 100 TB the raw events collapse
  * to a metadata-sized per-day frame in one shuffle
  * ([[ModelingFrame.daily]]), and fitting MANY series concurrently is a
  * `groupBy(series).applyInPandas`-shaped problem (here:
  * [[GroupedOls]]-style per-key aggregation) — one filter per key, keys
  * distributed. A single series' likelihood cannot be parallelized without
  * changing the estimator.
  */
/** Additive HOLT-WINTERS triple exponential smoothing — the classical
  * seasonal forecasting baseline next to [[Sarimax]] (statsmodels
  * `ExponentialSmoothing(trend="add", seasonal="add")`; the reference's
  * workflow benchmarks the statsmodels family, `Marilyn_Cleaning.ipynb`
  * cell 1 imports). Level/trend/season recursions are serial by nature —
  * driver-side math over the aggregate-collapsed series, exactly like the
  * Kalman filter; the distributed stage is whatever produces the series. */
object HoltWinters {

  final case class Fit(alpha: Double, beta: Double, gamma: Double, s: Int,
                       sse: Double, rmse: Double, level: Double, trend: Double,
                       season: Array[Double], nObs: Int) {
    /** h-step-ahead forecast from the end of the fitted series. */
    def forecast(h: Int): Double =
      level + h * trend + season((nObs + h - 1) % s)
  }

  /** One smoothing pass at fixed (α, β, γ): classical initialization
    * (level = mean of the first season, trend = first-vs-second-season
    * average slope, seasonals = first-season deviations), one-step-ahead
    * errors accumulated from the first full season onward. */
  def smooth(y: Array[Double], s: Int, alpha: Double, beta: Double,
             gamma: Double): Fit = {
    require(y.length >= 2 * s, s"need >= 2 seasons (${2 * s}), got ${y.length}")
    var level = y.take(s).sum / s
    val secondMean = y.slice(s, 2 * s).sum / s
    var trend = (secondMean - level) / s
    // DE-TRENDED seasonal init (statsmodels' classical device): without
    // the (i − (s−1)/2)·trend correction the within-season ramp leaks
    // into the seasonals and the pass starts visibly biased even on
    // noiseless data
    val season = Array.tabulate(s)(i => y(i) - (level + (i - (s - 1) / 2.0) * trend))
    var sse = 0.0
    var n = 0
    var t = 0
    while (t < y.length) {
      val si = t % s
      val pred = level + trend + season(si)
      if (t >= s) { sse += (y(t) - pred) * (y(t) - pred); n += 1 }
      val newLevel = alpha * (y(t) - season(si)) + (1 - alpha) * (level + trend)
      trend = beta * (newLevel - level) + (1 - beta) * trend
      season(si) = gamma * (y(t) - newLevel) + (1 - gamma) * season(si)
      level = newLevel
      t += 1
    }
    Fit(alpha, beta, gamma, s, sse, math.sqrt(sse / math.max(n, 1)),
      level, trend, season, y.length)
  }

  /** Grid-searched fit (the statsmodels-default-like optimization done as
    * a deterministic coarse grid — 48 driver-side smoothing passes, each
    * O(n)): minimal one-step-ahead SSE, ties to the smaller params. */
  def fit(y: Array[Double], s: Int): Fit = {
    val grid = for {
      a <- Seq(0.1, 0.3, 0.5, 0.8)
      b <- Seq(0.01, 0.1, 0.3)
      g <- Seq(0.05, 0.1, 0.3, 0.5)
    } yield (a, b, g)
    grid.map { case (a, b, g) => smooth(y, s, a, b, g) }
      .minBy(f => (f.sse, f.alpha, f.beta, f.gamma))
  }
}

object Sarimax {

  /** Model orders: ARIMA(p,d,q)×(P,D,Q)_s. */
  final case class Order(p: Int, d: Int, q: Int, P: Int, D: Int, Q: Int, s: Int) {
    require(p >= 0 && q >= 0 && P >= 0 && Q >= 0, "negative order")
    require(d >= 0 && d <= 2 && D >= 0 && D <= 1, "supported: d <= 2, D <= 1")
    require((P == 0 && Q == 0 && D == 0) || s >= 2, "seasonal terms need s >= 2")
    def nParams: Int = p + q + P + Q
  }

  final case class Fit(order: Order,
                       ar: Seq[Double], ma: Seq[Double],
                       sar: Seq[Double], sma: Seq[Double],
                       sigma2: Double, logLik: Double, aic: Double,
                       nObs: Int, evaluations: Int,
                       forecastNext: Double)

  /** Filter output: the pieces of the prediction-error decomposition.
    * Non-concentrated log-likelihood at any σ² follows as
    * `-0.5·(n·ln 2πσ² + sumLogF + sumV2F/σ²)`; the σ²-concentrated
    * profile is [[concentratedLogLik]]. `aNext` is the one-step-ahead
    * predicted state E[α_{n+1} | y_{1..n}] (the forecasting seed). */
  final case class FilterResult(n: Int, sumLogF: Double, sumV2F: Double,
                                aNext: DenseVector[Double]) {
    def sigma2Hat: Double = sumV2F / n
    def concentratedLogLik: Double =
      -0.5 * (n * (math.log(2 * math.Pi) + 1.0 + math.log(sigma2Hat)) + sumLogF)
    def logLikAt(sigma2: Double): Double =
      -0.5 * (n * math.log(2 * math.Pi * sigma2) + sumLogF + sumV2F / sigma2)
  }

  /** Multiply `(1 ∓ Σ aᵢBⁱ)(1 ∓ Σ Aⱼ B^{js})` and return the reduced lag
    * coefficients `c` with the SAME sign convention as the inputs, i.e.
    * the product is `1 ∓ Σ c_k B^k` (k = 1..len). Works for AR (minus
    * convention) and MA (plus convention) alike because the cross terms
    * flip sign twice for AR and not at all for MA — both land on
    * `c_{i+js} += -(∓)aᵢAⱼ`… concretely: polynomial convolution on the
    * full coefficient arrays, done once here instead of sign-juggled at
    * every call site. `sign` = −1 for AR polys, +1 for MA polys. */
  def expandPoly(nonSeasonal: Seq[Double], seasonal: Seq[Double], s: Int,
                 sign: Int): Array[Double] = {
    require(sign == 1 || sign == -1, "sign must be ±1")
    val a = Array.fill(nonSeasonal.size + 1)(0.0)
    a(0) = 1.0
    nonSeasonal.zipWithIndex.foreach { case (v, i) => a(i + 1) = sign * v }
    val b = Array.fill(seasonal.size * math.max(s, 1) + 1)(0.0)
    b(0) = 1.0
    seasonal.zipWithIndex.foreach { case (v, j) => b((j + 1) * s) = sign * v }
    val prod = Array.fill(a.length + b.length - 1)(0.0)
    for (i <- a.indices; j <- b.indices) prod(i + j) += a(i) * b(j)
    prod.drop(1).map(_ * sign) // back to the 1 ∓ Σ c B^k convention
  }

  /** `Δ^d Δ_s^D y` — the simple-differencing preprocessing step. */
  def difference(y: Array[Double], d: Int, bigD: Int, s: Int): Array[Double] = {
    var z = y
    var i = 0
    while (i < d) { z = z.indices.drop(1).map(k => z(k) - z(k - 1)).toArray; i += 1 }
    var j = 0
    while (j < bigD) { z = z.indices.drop(s).map(k => z(k) - z(k - s)).toArray; j += 1 }
    z
  }

  /** Monahan/Jones transform: ℝᵏ → coefficients of a STATIONARY AR(k)
    * `1 − Σ aᵢBⁱ`. Each unconstrained xᵢ maps to a partial autocorrelation
    * in (−1, 1) via x/√(1+x²); the Durbin–Levinson recursion then rebuilds
    * the AR coefficients. Bijective onto the stationary region, so the
    * optimizer roams ℝᵏ freely while every iterate stays valid. For MA
    * invertibility use the SAME map and negate ([[constrainMa]]): the
    * invertibility region of `1 + Σ θB` is the stationarity region of
    * `1 − Σ (−θ)B` — the polynomials are literally equal. */
  def constrainAr(x: Seq[Double]): Array[Double] = {
    val pacf = x.map(v => v / math.sqrt(1 + v * v)).toArray
    var a = Array.empty[Double]
    for (k <- pacf.indices) {
      val next = Array.fill(k + 1)(0.0)
      next(k) = pacf(k)
      for (i <- 0 until k) next(i) = a(i) - pacf(k) * a(k - 1 - i)
      a = next
    }
    a
  }

  def constrainMa(x: Seq[Double]): Array[Double] = constrainAr(x).map(-_)

  /** Kalman filter for a zero-mean reduced ARMA(p̄, q̄) in Harvey form,
    * σ² concentrated (filter run at σ² = 1).
    *
    * State dim r = max(p̄, q̄+1); transition T has the AR column + shifted
    * identity; disturbance loading R = (1, θ₁…θ_{r−1})ᵀ; observation
    * Z = e₁ᵀ, no measurement noise. Exact stationary initialization:
    * P₁ solves the Lyapunov equation P = TPTᵀ + RRᵀ via the
    * (I − T⊗T) vec(P) = vec(RRᵀ) linear solve — valid because the
    * PACF transform guarantees a stationary T. */
  def filter(z: Array[Double], arC: Array[Double], maC: Array[Double]): FilterResult = {
    val pBar = arC.length
    val qBar = maC.length
    val r = math.max(pBar, qBar + 1)
    val T = DenseMatrix.zeros[Double](r, r)
    for (i <- 0 until pBar) T(i, 0) = arC(i)
    for (i <- 0 until r - 1) T(i, i + 1) = 1.0
    val R = DenseVector.zeros[Double](r)
    R(0) = 1.0
    for (i <- 0 until qBar) R(i + 1) = maC(i)
    val RR = R * R.t
    // stationary P1: vec(P) = (I - T⊗T)^{-1} vec(RR')
    val lyap = DenseMatrix.eye[Double](r * r) - kron(T, T)
    val vecP = lyap \ RR.toDenseVector
    val P0 = new DenseMatrix(r, r, vecP.toArray)
    var a = DenseVector.zeros[Double](r)
    var P = (P0 + P0.t) * 0.5 // re-symmetrize solver round-off
    var sumLogF = 0.0
    var sumV2F = 0.0
    var t = 0
    while (t < z.length) {
      val v = z(t) - a(0)       // Z = e1'
      val f = P(0, 0)
      require(f > 1e-300, s"Kalman innovation variance collapsed at t=$t")
      sumLogF += math.log(f)
      sumV2F += v * v / f
      val Pz = P(::, 0)         // P Z'
      val K = (T * Pz) / f      // Kalman gain
      a = T * a + K * v
      P = T * P * T.t + RR - K * K.t * f
      P = (P + P.t) * 0.5
      t += 1
    }
    FilterResult(z.length, sumLogF, sumV2F, a)
  }

  /** Exact MLE. `y` is the RAW series in time order (differencing happens
    * inside); the optimizer is L-BFGS over the PACF-transformed
    * parameters with numeric gradients — each objective evaluation is one
    * O(n·r²) filter pass, trivially cheap at driver scale. */
  // tolerance 1e-7: with forward-difference gradients (ε = 1e-5) the
  // gradient noise floor sits near 1e-8·‖ll‖ — a tighter stop just makes
  // the line search thrash at the optimum it has already found
  def fit(y: Array[Double], order: Order, maxIter: Int = 200,
          tolerance: Double = 1e-7): Fit = {
    val z = difference(y, order.d, order.D, order.s)
    require(z.length > order.nParams + 1,
      s"series too short after differencing: ${z.length} obs for ${order.nParams} params")
    var evals = 0

    def unpack(x: DenseVector[Double]): (Array[Double], Array[Double]) = {
      val xs = x.toArray
      val phi = constrainAr(xs.slice(0, order.p).toSeq)
      val theta = constrainMa(xs.slice(order.p, order.p + order.q).toSeq)
      val sphi = constrainAr(xs.slice(order.p + order.q, order.p + order.q + order.P).toSeq)
      val stheta = constrainMa(xs.slice(order.p + order.q + order.P, order.nParams).toSeq)
      val arC = expandPoly(phi.toSeq, sphi.toSeq, order.s, sign = -1)
      val maC = expandPoly(theta.toSeq, stheta.toSeq, order.s, sign = 1)
      (arC, maC)
    }

    val negLogLik: DenseVector[Double] => Double = x => {
      evals += 1
      val (arC, maC) = unpack(x)
      -filter(z, arC, maC).concentratedLogLik
    }
    val x0 = DenseVector.zeros[Double](order.nParams)
    val xHat =
      if (order.nParams == 0) x0
      else {
        val obj: DiffFunction[DenseVector[Double]] =
          new ApproximateGradientFunction(negLogLik, epsilon = 1e-5)
        new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7, tolerance = tolerance)
          .minimize(obj, x0)
      }

    val (arC, maC) = unpack(xHat)
    val fr = filter(z, arC, maC)
    val ll = fr.concentratedLogLik
    val k = order.nParams + 1 // + sigma2
    val xs = xHat.toArray
    val phi = constrainAr(xs.slice(0, order.p).toSeq)
    val theta = constrainMa(xs.slice(order.p, order.p + order.q).toSeq)
    val sphi = constrainAr(xs.slice(order.p + order.q, order.p + order.q + order.P).toSeq)
    val stheta = constrainMa(xs.slice(order.p + order.q + order.P, order.nParams).toSeq)

    // 1-step forecast: ẑ_{n+1} = Z a_{n+1}, then undo the differencing
    // (v = Δ^d Δ_s^D y ⇒ y_{n+1} = ẑ + d·y_n + D·(y_{n+1−s} − d·y_{n−s}),
    // with the d=2 extension 2y_n − y_{n−1}).
    val zNext = fr.aNext(0)
    val n = y.length
    val undiffed = {
      val dPart = order.d match {
        case 0 => 0.0
        case 1 => y(n - 1)
        case 2 => 2 * y(n - 1) - y(n - 2)
      }
      val sPart =
        if (order.D == 1)
          y(n - order.s) - (order.d match {
            case 0 => 0.0
            case 1 => y(n - order.s - 1)
            case 2 => 2 * y(n - order.s - 1) - y(n - order.s - 2)
          })
        else 0.0
      zNext + dPart + sPart
    }
    Fit(order, phi.toSeq, theta.toSeq, sphi.toSeq, stheta.toSeq,
      fr.sigma2Hat, ll, 2.0 * k - 2.0 * ll, fr.n, evals, undiffed)
  }
}
