package graft.ml

/** Autocorrelation / partial-autocorrelation driver math — the
  * order-selection diagnostics behind the reference's SARIMAX workflow
  * (statsmodels `plot_acf`/`plot_pacf` before picking (p, q); the fitted
  * orders land in `Marilyn_Cleaning.ipynb:34 (cell 1)`).
  *
  * The ACF itself is computed DISTRIBUTED by the `ml_acf` registry query
  * (windows + aggregates, DuckDB-oracle-checked); this object holds the
  * O(maxLag²) scalar recursions that have no SQL form: [[pacf]] converts
  * an ACF prefix to the PACF via Durbin–Levinson, and [[acf]] is the
  * plain in-memory reference used by the spec.
  */
object Acf {

  /** Sample ACF at lags 0..maxLag: r(k) = Σ_{t<n−k}(x_t−μ)(x_{t+k}−μ) /
    * Σ(x_t−μ)² — the standard biased estimator (denominator over the full
    * series, the statsmodels default). */
  def acf(x: Array[Double], maxLag: Int): Array[Double] = {
    require(x.length > maxLag, s"need > $maxLag observations, got ${x.length}")
    val n = x.length
    val mu = x.sum / n
    val c = x.map(_ - mu)
    val den = c.map(v => v * v).sum
    (0 to maxLag).map { k =>
      var s = 0.0
      var t = 0
      while (t < n - k) { s += c(t) * c(t + k); t += 1 }
      s / den
    }.toArray
  }

  /** PACF at lags 1..maxLag from an ACF prefix `r` (r(0)=1 at index 0)
    * via the Durbin–Levinson recursion: φ_{k,k} is the k-th partial
    * autocorrelation — the Yule–Walker AR(k) last coefficient, which is
    * what `plot_pacf(method="ywm")` draws. O(maxLag²), driver-sized. */
  def pacf(r: Array[Double]): Array[Double] = {
    require(r.length >= 2 && math.abs(r(0) - 1.0) < 1e-12, "r must start at r(0)=1")
    val maxLag = r.length - 1
    val phi = Array.ofDim[Double](maxLag + 1, maxLag + 1)
    val out = new Array[Double](maxLag)
    var v = 1.0
    for (k <- 1 to maxLag) {
      var num = r(k)
      var j = 1
      while (j < k) { num -= phi(k - 1)(j) * r(k - j); j += 1 }
      val pk = num / v
      phi(k)(k) = pk
      j = 1
      while (j < k) { phi(k)(j) = phi(k - 1)(j) - pk * phi(k - 1)(k - j); j += 1 }
      v *= (1.0 - pk * pk)
      out(k - 1) = pk
    }
    out
  }
}
