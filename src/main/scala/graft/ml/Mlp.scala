package graft.ml

import breeze.linalg.DenseVector
import breeze.optimize.{DiffFunction, LBFGS}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Gradient buffer for one MLP full-batch pass: elementwise-summable. */
final case class MlpBuf(n: Long, loss: Double, grad: Array[Double])

/** Full-batch loss+gradient of a 1-hidden-layer ReLU MLP as a custom
  * [[Aggregator]]: per row one forward + backward pass, the shuffle
  * carries the (h·k + 2h + 1)-double gradient with map-side partial
  * aggregation — the classic distributed-L-BFGS shape (one aggregation
  * job per optimizer evaluation, data scanned once, driver holds only
  * the parameter vector).
  *
  * Flat weight layout: W1 (h×k row-major) ++ b1 (h) ++ w2 (h) ++ b2 (1).
  * Loss matches sklearn `MLPRegressor`: ½·mean((ŷ−y)²) +
  * α/(2n)·(‖W1‖² + ‖w2‖²) — biases unpenalized; the α term is added by
  * the driver in [[Mlp.fit]], this Aggregator returns raw sums.
  */
class MlpGrad(k: Int, h: Int, weights: Array[Double])
    extends Aggregator[(Seq[Double], Double), MlpBuf, Seq[Double]] {
  require(weights.length == h * k + 2 * h + 1, "bad weight vector length")
  private val nW = weights.length

  override def zero: MlpBuf = MlpBuf(0L, 0.0, Array.fill(nW)(0.0))

  override def reduce(b: MlpBuf, in: (Seq[Double], Double)): MlpBuf = {
    val (x, y) = in
    if (x == null || x.length != k || y.isNaN || x.exists(_.isNaN)) return b
    val w = weights
    val g = b.grad
    val off1 = h * k          // b1
    val off2 = h * k + h      // w2
    val offB = nW - 1         // b2
    // forward
    val z = new Array[Double](h)
    val a = new Array[Double](h)
    var yhat = w(offB)
    var i = 0
    while (i < h) {
      var s = w(off1 + i)
      var j = 0
      while (j < k) { s += w(i * k + j) * x(j); j += 1 }
      z(i) = s
      a(i) = if (s > 0) s else 0.0
      yhat += w(off2 + i) * a(i)
      i += 1
    }
    // backward (e = dLoss_row/dŷ for loss_row = ½e²)
    val e = yhat - y
    g(offB) += e
    i = 0
    while (i < h) {
      g(off2 + i) += e * a(i)
      if (z(i) > 0) {
        val dz = e * w(off2 + i)
        g(off1 + i) += dz
        var j = 0
        while (j < k) { g(i * k + j) += dz * x(j); j += 1 }
      }
      i += 1
    }
    MlpBuf(b.n + 1, b.loss + 0.5 * e * e, g)
  }

  override def merge(x: MlpBuf, y: MlpBuf): MlpBuf = {
    var i = 0
    while (i < nW) { x.grad(i) += y.grad(i); i += 1 }
    MlpBuf(x.n + y.n, x.loss + y.loss, x.grad)
  }

  /** `[n, lossSum, gradSum…]` — the driver finishes the mean + penalty. */
  override def finish(b: MlpBuf): Seq[Double] =
    b.n.toDouble +: b.loss +: b.grad.toSeq

  override def bufferEncoder: Encoder[MlpBuf] = Encoders.product[MlpBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Single-hidden-layer ReLU MLP regressor, trained full-batch with
  * L-BFGS — the solver sklearn itself recommends for small-to-mid data
  * (`MLPRegressor(solver="lbfgs")`); the reference's MLP baseline
  * "collapsed" (`slide24.xml`), and unscaled inputs are the usual cause,
  * so [[fit]] z-scales features and centers the label internally and
  * folds the transform back into the returned prediction expression.
  *
  * Scale posture: identical to [[Svr]] — one aggregation job per
  * optimizer evaluation via [[MlpGrad]], shuffle carries O(h·k) doubles,
  * prediction is a pure codegen'd column expression (no UDF).
  */
object Mlp {

  final case class MlpModel(k: Int, h: Int, weights: Array[Double],
                            featMean: Seq[Double], featStd: Seq[Double],
                            labelMean: Double, trainLoss: Double) {
    /** Declarative forward pass: h·k multiply-adds as nested column
      * expressions — stays inside whole-stage codegen. */
    def predictExpr(featureCols: Seq[String]): Column = {
      require(featureCols.size == k, s"expected $k features")
      val off1 = h * k
      val off2 = h * k + h
      val xs = featureCols.zipWithIndex.map { case (c, j) =>
        (col(c) - lit(featMean(j))) / lit(featStd(j)) }
      val hidden = (0 until h).map { i =>
        val z = xs.zipWithIndex.map { case (x, j) => x * lit(weights(i * k + j)) }
          .reduce(_ + _) + lit(weights(off1 + i))
        greatest(z, lit(0.0)) * lit(weights(off2 + i))
      }
      hidden.reduce(_ + _) + lit(weights.last) + lit(labelMean)
    }
  }

  /** Deterministic He-style init (fixed seed): ReLU-friendly fan-in
    * scaling for W1/w2, zero biases. */
  def init(k: Int, h: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    val w = new Array[Double](h * k + 2 * h + 1)
    val s1 = math.sqrt(2.0 / k)
    val s2 = math.sqrt(2.0 / h)
    var i = 0
    while (i < h * k) { w(i) = rnd.nextGaussian() * s1; i += 1 }
    i = h * k + h
    while (i < h * k + 2 * h) { w(i) = rnd.nextGaussian() * s2; i += 1 }
    w
  }

  /** One distributed loss+gradient evaluation at `weights` over a frame
    * of (features array, label) columns `xCol`/`yCol`; returns
    * (meanLoss + α-penalty, gradient). Exposed for the numeric
    * gradient-check in MlSpec. */
  def evaluate(df: DataFrame, xCol: String, yCol: String, k: Int, h: Int,
               weights: Array[Double], alpha: Double): (Double, Array[Double]) = {
    val ga = udaf(new MlpGrad(k, h, weights))
    finishEval(df.select(ga(col(xCol), col(yCol)).as("g")).head().getSeq[Double](0),
      weights, k, h, alpha)
  }

  /** Driver-side twin of [[evaluate]]: the SAME [[MlpGrad]] folded over
    * already-collected rows — the adaptive path for aggregate-sized
    * training frames, where a scheduled job per L-BFGS evaluation is
    * pure overhead (see the bound note in [[fit]]). */
  def evaluateLocal(rows: Array[(Seq[Double], Double)], k: Int, h: Int,
                    weights: Array[Double], alpha: Double): (Double, Array[Double]) = {
    val ga = new MlpGrad(k, h, weights)
    finishEval(ga.finish(rows.foldLeft(ga.zero)(ga.reduce)), weights, k, h, alpha)
  }

  private def finishEval(out: Seq[Double], weights: Array[Double], k: Int,
                         h: Int, alpha: Double): (Double, Array[Double]) = {
    val n = math.max(out.head, 1.0)
    val lossSum = out(1)
    val grad = out.drop(2).toArray
    // mean the data term; add the sklearn-style α/(2n)·‖W‖² penalty
    // (weights only — biases at [h·k, h·k+h) and the last slot excluded)
    val off1 = h * k
    val off2 = h * k + h
    var penalty = 0.0
    var i = 0
    while (i < grad.length) {
      grad(i) /= n
      val isWeight = i < off1 || (i >= off2 && i < grad.length - 1)
      if (isWeight) {
        penalty += weights(i) * weights(i)
        grad(i) += alpha * weights(i) / n
      }
      i += 1
    }
    (lossSum / n + alpha * penalty / (2.0 * n), grad)
  }

  /** Fit with sklearn-shaped hyperparameters (`hidden_layer_sizes=(h,)`,
    * `alpha=1e-4`, `solver="lbfgs"`, seeded init). */
  def fit(df: DataFrame, featureCols: Seq[String], label: String,
          h: Int = 32, alpha: Double = 1e-4, maxIter: Int = 200,
          seed: Long = 42, tolerance: Double = 1e-5): MlpModel = {
    val k = featureCols.size
    // internal standardization (shared moments job — see Standardize)
    val Standardize.Moments(mu, sd, muY) =
      Standardize.moments(df, featureCols, label)
    val scaled = df.select(
      array(featureCols.zipWithIndex.map { case (c, j) =>
        (col(c) - lit(mu(j))) / lit(sd(j)) }: _*).as("x"),
      (col(label) - lit(muY)).as("y"))
      .cache()
    try {
      // materialize once; every L-BFGS eval re-scans it. Adaptive path
      // (driver-sized-bounds convention): an aggregate-sized frame is
      // collected ONCE and each evaluation folds the same MlpGrad on the
      // driver; larger frames keep the distributed per-evaluation job.
      val local: Option[Array[(Seq[Double], Double)]] =
        if (scaled.count() <= Models.MaxDriverFitRows)
          Some(scaled.collect().map(r => (r.getSeq[Double](0), r.getDouble(1))))
        else None
      val objective = new DiffFunction[DenseVector[Double]] {
        override def calculate(theta: DenseVector[Double]): (Double, DenseVector[Double]) = {
          val (loss, grad) = local match {
            case Some(rows) => evaluateLocal(rows, k, h, theta.toArray, alpha)
            case None       => evaluate(scaled, "x", "y", k, h, theta.toArray, alpha)
          }
          (loss, DenseVector(grad))
        }
      }
      // tolerance 1e-5 default (sklearn MLPRegressor stops at tol=1e-4):
      // every extra evaluation is a full distributed pass — so take the
      // final loss from the optimizer state instead of re-evaluating
      val lbfgs = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7, tolerance = tolerance)
      val state = lbfgs.minimizeAndReturnState(objective, DenseVector(init(k, h, seed)))
      MlpModel(k, h, state.x.toArray, mu, sd, muY, state.value)
    } finally { scaled.unpersist(); () }
  }
}
