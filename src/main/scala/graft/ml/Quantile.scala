package graft.ml

import breeze.linalg.DenseVector
import breeze.optimize.{DiffFunction, LBFGS}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Elementwise-summable buffer for one pinball full-batch pass. */
final case class PinballBuf(loss: Double, psi: Double, grad: Array[Double])

/** Full-batch smoothed-pinball loss + gradient as a custom [[Aggregator]]
  * — the [[SvrGrad]] execution shape: one aggregation job per L-BFGS
  * evaluation, the shuffle carries k+2 doubles with map-side combine.
  *
  * Loss (Huberized per side, C¹ everywhere, kink quadratically bridged
  * on each side of 0 so value AND slope are continuous):
  *   r ≥ δ:       τ(r − δ/2)            ψ = τ
  *   0 ≤ r < δ:   τ·r²/(2δ)             ψ = τ·r/δ
  *   −δ < r < 0:  (1−τ)·r²/(2δ)         ψ = (1−τ)·r/δ
  *   r ≤ −δ:      (1−τ)(−r − δ/2)       ψ = τ − 1
  * δ → 0 recovers the exact pinball loss; the optimum moves by O(δ). */
class PinballGrad(k: Int, w: Array[Double], b: Double, tau: Double,
                  smoothing: Double)
    extends Aggregator[(Seq[Double], Double), PinballBuf, Seq[Double]] {
  require(w.length == k, "bad weight vector length")

  override def zero: PinballBuf = PinballBuf(0.0, 0.0, Array.fill(k)(0.0))

  override def reduce(buf: PinballBuf, in: (Seq[Double], Double)): PinballBuf = {
    val (x, y) = in
    if (x == null || x.length != k || y.isNaN) return buf
    var pred = b
    var j = 0
    while (j < k) { pred += w(j) * x(j); j += 1 }
    val r = y - pred
    val side = if (r >= 0) tau else 1.0 - tau
    val (loss, psi) =
      if (math.abs(r) >= smoothing)
        (side * (math.abs(r) - smoothing / 2.0), if (r >= 0) tau else tau - 1.0)
      else (side * r * r / (2.0 * smoothing), side * r / smoothing)
    val g = buf.grad
    j = 0
    while (j < k) { g(j) += psi * x(j); j += 1 }
    PinballBuf(buf.loss + loss, buf.psi + psi, g)
  }

  override def merge(a: PinballBuf, b2: PinballBuf): PinballBuf = {
    var i = 0
    while (i < k) { a.grad(i) += b2.grad(i); i += 1 }
    PinballBuf(a.loss + b2.loss, a.psi + b2.psi, a.grad)
  }

  override def finish(b2: PinballBuf): Seq[Double] = b2.loss +: b2.psi +: b2.grad.toSeq

  override def bufferEncoder: Encoder[PinballBuf] = Encoders.product[PinballBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Linear QUANTILE regression (Koenker & Bassett 1978), distributed.
  *
  * The forecasting upgrade a point-prediction product ships next: the
  * reference reports conditional MEANS only; a trading decision needs the
  * conditional τ-quantiles (risk bands) — the regression analog of
  * `ml_conformal_interval`'s distribution-free bands, but COVARIATE-
  * DEPENDENT: the band width moves with x.
  *
  * Execution model = [[Svr]]'s: breeze L-BFGS on the driver over the
  * smoothed pinball objective; each evaluation is ONE distributed
  * aggregation (loss, Σψ, Σψ·xⱼ) with map-side combine — data scanned
  * once per evaluation, never collected (above the driver-size bound),
  * so the loop holds on a 1000-executor cluster. Inputs are z-scaled and
  * the label centered internally for conditioning (weights mapped back
  * to raw space); a λ‖w‖²/2 ridge term (λ=1e-6 default) keeps the
  * Hessian bounded away from zero on flat pinball plateaus.
  */
object Quantile {

  final case class QuantileModel(tau: Double, coefficients: Seq[Double],
                                 intercept: Double, objective: Double,
                                 evaluations: Int) {
    /** Declarative prediction expression (codegen-friendly, no UDF). */
    def predictExpr(featureCols: Seq[String]): Column =
      featureCols.zip(coefficients)
        .map { case (c, w) => col(c) * lit(w) }
        .reduceOption(_ + _).getOrElse(lit(0.0)) + lit(intercept)
  }

  def fit(df: DataFrame, featureCols: Seq[String], label: String, tau: Double,
          smoothing: Double = 1e-3, lambda: Double = 1e-6,
          maxIter: Int = 200, tolerance: Double = 1e-7): QuantileModel = {
    require(featureCols.nonEmpty, "need at least one feature")
    require(tau > 0 && tau < 1, "tau in (0, 1)")
    require(smoothing > 0 && lambda >= 0, "delta>0, lambda>=0")
    val k = featureCols.size

    // z-scale features, center the label (conditioning; same device and
    // rationale as Svr.fitStandardized) — one tiny stats aggregate
    val statAggs = featureCols.flatMap(c =>
      Seq(avg(col(c)).as(s"mu_$c"), stddev_pop(col(c)).as(s"sd_$c"))) :+
      avg(col(label)).as("mu_y")
    val st = df.agg(statAggs.head, statAggs.tail: _*).head()
    val mu = featureCols.map(c => st.getAs[Double](s"mu_$c"))
    val sd = featureCols.map(c => math.max(st.getAs[Double](s"sd_$c"), 1e-12))
    val muY = st.getAs[Double]("mu_y")

    val packed = df.select(
      array(featureCols.zipWithIndex.map { case (c, j) =>
        ((col(c) - lit(mu(j))) / lit(sd(j))).cast("double") }: _*).as("x"),
      (col(label) - lit(muY)).cast("double").as("y"))

    // adaptive evaluation path: aggregate-sized frames fold the SAME
    // Aggregator on the driver; larger frames run the distributed loop
    val local: Option[Array[(Seq[Double], Double)]] =
      if (packed.count() <= Models.MaxDriverFitRows)
        Some(packed.collect().map(r => (r.getSeq[Double](0), r.getDouble(1))))
      else None

    var evals = 0
    val objective = new DiffFunction[DenseVector[Double]] {
      override def calculate(theta: DenseVector[Double]): (Double, DenseVector[Double]) = {
        evals += 1
        val w = theta(0 until k).toArray
        val b = theta(k)
        val ga = new PinballGrad(k, w, b, tau, smoothing)
        val out = local match {
          case Some(rows) => ga.finish(rows.foldLeft(ga.zero)(ga.reduce))
          case None =>
            val gu = udaf(ga)
            packed.agg(gu(col("x"), col("y")).as("g")).head().getSeq[Double](0)
        }
        val grad = DenseVector.zeros[Double](k + 1)
        var i = 0
        while (i < k) { grad(i) = lambda * w(i) - out(2 + i); i += 1 }
        grad(k) = -out(1)
        val obj = 0.5 * lambda * w.map(x => x * x).sum + out(0)
        (obj, grad)
      }
    }

    val lbfgs = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7,
      tolerance = tolerance)
    val state = lbfgs.minimizeAndReturnState(objective, DenseVector.zeros[Double](k + 1))
    // map the scaled-space fit back to raw feature space
    val wScaled = state.x(0 until k).toArray
    val wRaw = wScaled.indices.map(j => wScaled(j) / sd(j))
    val bRaw = muY + state.x(k) - wRaw.indices.map(j => wRaw(j) * mu(j)).sum
    QuantileModel(tau, wRaw, bRaw, state.value, evals)
  }
}
