package graft.ml

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group multiple linear regression as a custom [[Aggregator]] — the
  * §2.11 "custom UDAF actually warranted" case: Spark's `regr_*`
  * aggregates handle ONE regressor; fitting `y ~ x₁..x_k` per group
  * (per-series trend/seasonality fits, per-key calibration) otherwise
  * needs a groupBy-collect or one MLlib job per key, neither of which
  * scales past a handful of groups.
  *
  * Accumulates the normal-equation sufficient statistics per group —
  * the upper triangle of X'X (k(k+1)/2 doubles) plus X'y (k) and n —
  * so the shuffle carries O(k²) per group regardless of row count, with
  * full map-side partial aggregation; `finish` solves the k×k system
  * with Gaussian elimination on the driver side of the aggregation.
  * The caller includes the intercept as a constant-1 feature column.
  *
  * Input rows whose feature array length ≠ k (or with null/NaN members)
  * are counted in `nBad` and excluded from the fit rather than poisoning
  * it. Output: coefficients in feature order, or all-NaN when the Gram
  * matrix is singular (fewer distinct rows than features).
  */
class GroupedOls(k: Int) extends Aggregator[(Seq[Double], Double), GramBuf, Seq[Double]] {
  require(k >= 1, "need at least one feature (include the intercept column)")
  private val triN = k * (k + 1) / 2

  override def zero: GramBuf =
    GramBuf(0L, 0L, 0.0, Array.fill(triN)(0.0), Array.fill(k)(0.0))

  override def reduce(b: GramBuf, in: (Seq[Double], Double)): GramBuf = {
    val (x, y) = in
    if (x == null || x.length != k || y.isNaN || x.exists(_.isNaN)) {
      b.copy(nBad = b.nBad + 1)
    } else {
      var t = 0
      var i = 0
      while (i < k) {
        var j = i
        while (j < k) { b.xtx(t) += x(i) * x(j); t += 1; j += 1 }
        b.xty(i) += x(i) * y
        i += 1
      }
      b.copy(n = b.n + 1, yty = b.yty + y * y)
    }
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    var i = 0
    while (i < triN) { a.xtx(i) += b.xtx(i); i += 1 }
    i = 0
    while (i < k) { a.xty(i) += b.xty(i); i += 1 }
    a.copy(n = a.n + b.n, nBad = a.nBad + b.nBad, yty = a.yty + b.yty)
  }

  override def finish(b: GramBuf): Seq[Double] = {
    // expand the packed triangle, then solve (X'X) w = X'y with partial
    // pivoting — k is small (a handful of trend/seasonal terms)
    val m = Array.ofDim[Double](k, k + 1)
    var t = 0
    for (i <- 0 until k; j <- i until k) {
      m(i)(j) = b.xtx(t); m(j)(i) = b.xtx(t); t += 1
    }
    for (i <- 0 until k) m(i)(k) = b.xty(i)
    for (col <- 0 until k) {
      val p = (col until k).maxBy(r => math.abs(m(r)(col)))
      if (math.abs(m(p)(col)) < 1e-12) return Seq.fill(k)(Double.NaN)
      val tmp = m(col); m(col) = m(p); m(p) = tmp
      for (r <- 0 until k if r != col) {
        val f = m(r)(col) / m(col)(col)
        for (c <- col to k) m(r)(c) -= f * m(col)(c)
      }
    }
    (0 until k).map(i => m(i)(k) / m(i)(i))
  }

  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** [[GroupedOls]] returning inference statistics as well: output is
  * `coefs(k) ++ tstats(k)` where t_j = w_j / se_j,
  * se_j = √(s²·(X'X)⁻¹_jj), s² = (y'y − w·X'y)/(n−k). The full inverse
  * comes from Gauss-Jordan on the same small Gram matrix. This is what
  * makes an in-engine augmented Dickey-Fuller test possible
  * (`stationarity_test_adf`): ADF needs the t-stat of one coefficient in
  * a MULTIPLE regression, which `regr_*` cannot provide. */
class GroupedOlsStats(k: Int) extends GroupedOls(k) {
  override def finish(b: GramBuf): Seq[Double] = {
    val coefs = super.finish(b)
    if (coefs.exists(_.isNaN) || b.n <= k) return coefs ++ Seq.fill(k)(Double.NaN)
    // Gauss-Jordan inverse of X'X (k x 2k augmentation)
    val m = Array.ofDim[Double](k, 2 * k)
    var t = 0
    for (i <- 0 until k; j <- i until k) {
      m(i)(j) = b.xtx(t); m(j)(i) = b.xtx(t); t += 1
    }
    for (i <- 0 until k) m(i)(k + i) = 1.0
    for (col <- 0 until k) {
      val p = (col until k).maxBy(r => math.abs(m(r)(col)))
      if (math.abs(m(p)(col)) < 1e-12) return coefs ++ Seq.fill(k)(Double.NaN)
      val tmp = m(col); m(col) = m(p); m(p) = tmp
      val d = m(col)(col)
      for (c <- 0 until 2 * k) m(col)(c) /= d
      for (r <- 0 until k if r != col) {
        val f = m(r)(col)
        for (c <- 0 until 2 * k) m(r)(c) -= f * m(col)(c)
      }
    }
    val sse = b.yty - coefs.zipWithIndex.map { case (w, i) => w * b.xty(i) }.sum
    val s2 = math.max(sse, 0.0) / (b.n - k)
    coefs ++ (0 until k).map(j => coefs(j) / math.sqrt(s2 * m(j)(k + j)))
  }
}

/** Normal-equation sufficient statistics: row/bad-row counts, y'y, packed
  * upper triangle of X'X, and X'y. */
case class GramBuf(n: Long, nBad: Long, yty: Double,
                   xtx: Array[Double], xty: Array[Double])
