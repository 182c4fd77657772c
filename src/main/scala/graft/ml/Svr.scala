package graft.ml

import breeze.linalg.DenseVector
import breeze.optimize.{DiffFunction, LBFGS}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Elementwise-summable buffer for one SVR full-batch pass. */
final case class SvrBuf(loss: Double, psi: Double, grad: Array[Double])

/** Full-batch smoothed-hinge loss + gradient of linear ε-SVR as a custom
  * [[Aggregator]] (the [[graft.ml.MlpGrad]] execution shape): one
  * aggregation job per L-BFGS evaluation, shuffle carries k+2 doubles
  * with map-side partial aggregation. vs the earlier k+2-named-SQL-
  * aggregates formulation this keeps the per-evaluation plan O(1) —
  * with k in the RFF hundreds, Catalyst re-analysis/codegen of the wide
  * aggregate dominated every evaluation (the data math is identical:
  * loss 0 | a²/2δ | a−δ/2 outside the ε-tube, ψ its derivative). */
class SvrGrad(k: Int, w: Array[Double], b: Double,
              epsilon: Double, smoothing: Double)
    extends Aggregator[(Seq[Double], Double), SvrBuf, Seq[Double]] {
  require(w.length == k, "bad weight vector length")

  override def zero: SvrBuf = SvrBuf(0.0, 0.0, Array.fill(k)(0.0))

  override def reduce(buf: SvrBuf, in: (Seq[Double], Double)): SvrBuf = {
    val (x, y) = in
    if (x == null || x.length != k || y.isNaN) return buf
    var pred = b
    var j = 0
    while (j < k) { pred += w(j) * x(j); j += 1 }
    val r = y - pred
    val a = math.abs(r) - epsilon
    if (a <= 0) return buf // inside the tube: zero loss, zero gradient
    val loss = if (a < smoothing) a * a / (2.0 * smoothing) else a - smoothing / 2.0
    val psi = math.signum(r) * math.min(a / smoothing, 1.0)
    val g = buf.grad
    j = 0
    while (j < k) { g(j) += psi * x(j); j += 1 }
    SvrBuf(buf.loss + loss, buf.psi + psi, g)
  }

  override def merge(x: SvrBuf, y: SvrBuf): SvrBuf = {
    var i = 0
    while (i < k) { x.grad(i) += y.grad(i); i += 1 }
    SvrBuf(x.loss + y.loss, x.psi + y.psi, x.grad)
  }

  /** `[lossSum, ψSum, gradSum…]` — the driver adds penalty and C. */
  override def finish(b: SvrBuf): Seq[Double] = b.loss +: b.psi +: b.grad.toSeq

  override def bufferEncoder: Encoder[SvrBuf] = Encoders.product[SvrBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Linear ε-insensitive support-vector regression, distributed.
  *
  * The reference benchmarks sklearn `SVR()` as a weak baseline
  * (`slide20.xml`: "underperformed"; imports in `Marilyn_Cleaning.ipynb`
  * cell 1). Kernel (RBF) SVR trains against an O(n²) kernel matrix —
  * there is no honest 100 TB analog of the exact Gram-matrix solver, so
  * the base fit implements the `sklearn.svm.LinearSVR` formulation, and
  * [[fitRbf]] lifts it to the RBF kernel through a seeded
  * random-Fourier-features map (linear in n — see its doc):
  *
  *   min_{w,b}  ½‖w‖² + C·Σᵢ L_ε(yᵢ − w·xᵢ − b)
  *
  * with L_ε the ε-insensitive loss, smoothed by a quadratic ramp of width
  * δ at the tube boundary so the objective is differentiable (δ → 0
  * recovers the exact hinge; the optimum moves by O(δ)).
  *
  * Execution model: breeze L-BFGS drives the (tiny) parameter vector on
  * the driver; every objective evaluation is ONE distributed aggregation
  * job — loss, Σψᵢ and Σψᵢ·xᵢⱼ as codegen'd SQL aggregates over the
  * training frame, where ψ = ∂L/∂r. The shuffle carries k+2 doubles, the
  * data is scanned once per L-BFGS evaluation (identical shape to MLlib's
  * own gradient-descent loop, so the pattern holds on a 1000-executor
  * cluster; cache the frame).
  */
object Svr {

  final case class LinearSvrModel(coefficients: Seq[Double], intercept: Double,
                                  objective: Double, evaluations: Int) {
    /** Declarative prediction expression (codegen-friendly, no UDF). */
    def predictExpr(featureCols: Seq[String]): Column =
      featureCols.zip(coefficients)
        .map { case (c, w) => col(c) * lit(w) }
        .reduceOption(_ + _).getOrElse(lit(0.0)) + lit(intercept)
  }

  /** Fit with sklearn `LinearSVR`-shaped hyperparameters
    * (C=1.0, epsilon=0.0 are sklearn's defaults).
    *
    * `standardize=true` (default): features are z-scaled and the label
    * centered internally, and the fitted weights mapped back to raw
    * space — both what sklearn's own docs tell `LinearSVR` users to do
    * and what the reference pipeline does (`slide13.xml` normalization).
    * It is also what makes first-order optimization tractable here: raw
    * features with large means give the hinge surface a condition number
    * that sends L-BFGS line searches thrashing. Note the ½‖w‖² penalty
    * then applies to the SCALED weights (exactly the sklearn
    * scale-then-fit pipeline semantics). */
  def fit(df: DataFrame, featureCols: Seq[String], label: String,
          c: Double = 1.0, epsilon: Double = 0.0, smoothing: Double = 1e-3,
          maxIter: Int = 200, tolerance: Double = 1e-6,
          standardize: Boolean = true): LinearSvrModel = {
    require(featureCols.nonEmpty, "need at least one feature")
    require(c > 0 && smoothing > 0 && epsilon >= 0, "C>0, δ>0, ε≥0")
    if (standardize) return fitStandardized(
      df, featureCols, label, c, epsilon, smoothing, maxIter, tolerance)
    val k = featureCols.size
    var evals = 0

    // features packed into ONE array column so each evaluation's plan is
    // a single typed-Aggregator aggregate — constant-size regardless of k
    val packed = df.select(
      array(featureCols.map(cn => col(cn).cast("double")): _*).as("x"),
      col(label).cast("double").as("y"))

    // Adaptive evaluation path (the repo's driver-sized-bounds
    // convention): an aggregate-sized training frame (the day-grain
    // modeling table — bounded at ANY corpus SF) pays ~300 scheduled
    // no-op jobs if every L-BFGS evaluation is distributed; collect it
    // ONCE and fold the SAME Aggregator over the rows on the driver.
    // Row-level frames above the bound keep the one-aggregation-per-
    // evaluation distributed loop — that is the 100 TB path.
    val local: Option[Array[(Seq[Double], Double)]] =
      if (packed.count() <= Models.MaxDriverFitRows)
        Some(packed.collect().map(r => (r.getSeq[Double](0), r.getDouble(1))))
      else None

    val objective = new DiffFunction[DenseVector[Double]] {
      override def calculate(theta: DenseVector[Double]): (Double, DenseVector[Double]) = {
        evals += 1
        val w = theta(0 until k).toArray
        val b = theta(k)
        val ga = new SvrGrad(k, w, b, epsilon, smoothing)
        val out = local match {
          case Some(rows) => ga.finish(rows.foldLeft(ga.zero)(ga.reduce))
          case None =>
            val gu = udaf(ga)
            packed.agg(gu(col("x"), col("y")).as("g")).head().getSeq[Double](0)
        }
        val lossSum = out(0)
        val psiSum = out(1)
        val grad = DenseVector.zeros[Double](k + 1)
        var i = 0
        while (i < k) { grad(i) = w(i) - c * out(2 + i); i += 1 }
        grad(k) = -c * psiSum
        val obj = 0.5 * w.map(x => x * x).sum + c * lossSum
        (obj, grad)
      }
    }

    // tolerance default 1e-6 (sklearn LinearSVR stops at tol=1e-4): every
    // extra L-BFGS evaluation is a full distributed pass over the data —
    // so take the final objective from the optimizer state instead of
    // re-evaluating at the solution
    val lbfgs = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7, tolerance = tolerance)
    val state = lbfgs.minimizeAndReturnState(objective, DenseVector.zeros[Double](k + 1))
    LinearSvrModel(state.x(0 until k).toArray.toSeq, state.x(k), state.value, evals)
  }

  /** RBF-kernel ε-SVR made linear in n via RANDOM FOURIER FEATURES
    * (Rahimi & Recht, "Random Features for Large-Scale Kernel Machines",
    * NeurIPS 2007 — the published scale-out route the linear-only
    * exclusion note above pointed at). Bochner's theorem: the shift-
    * invariant kernel k(x,y)=exp(−γ‖x−y‖²) is the expectation of
    * cos(wᵀx+b)·cos(wᵀy+b) under w ~ N(0, 2γI), b ~ U[0,2π); with D
    * seeded draws the map
    *
    *   z(x) = √(2/D) · [cos(wᵢᵀx + bᵢ)]ᵢ₌₁..D
    *
    * satisfies z(x)ᵀz(y) → k(x,y) at rate O(1/√D), so LinearSVR on z
    * approximates kernel SVR without ever forming the O(n²) Gram matrix.
    *
    * Execution model: W (D×k) and b are a few KB drawn on the driver
    * from a fixed seed; the map is D pure cos() projection COLUMNS
    * (codegen'd, narrow, no UDF, no shuffle), and the fit is the same
    * one-distributed-aggregation-per-evaluation loop as [[fit]] — the
    * whole thing scans the data, never pairs it, so it holds at 100 TB.
    * Inputs are z-scaled first (γ is then in units of standardized
    * squared distance, the `RBFSampler`-after-`StandardScaler` sklearn
    * pipeline shape); the model carries the full map for prediction. */
  final case class RbfSvrModel(freq: Seq[Seq[Double]], phase: Seq[Double],
                               mu: Seq[Double], sd: Seq[Double],
                               linear: LinearSvrModel, gamma: Double) {
    /** The feature map as columns over the RAW feature columns. */
    def featureExprs(featureCols: Seq[String]): Seq[Column] = {
      val d = freq.size
      val xs = featureCols.zipWithIndex.map { case (c, j) =>
        (col(c) - lit(mu(j))) / lit(sd(j)) }
      freq.zip(phase).map { case (w, b) =>
        lit(math.sqrt(2.0 / d)) *
          cos(xs.zip(w).map { case (x, wj) => x * lit(wj) }.reduce(_ + _) + lit(b))
      }
    }
    /** End-to-end prediction expression (map ∘ linear head), still one
      * codegen'd scalar expression — no UDF. */
    def predictExpr(featureCols: Seq[String]): Column =
      featureExprs(featureCols).zip(linear.coefficients)
        .map { case (z, w) => z * lit(w) }
        .reduce(_ + _) + lit(linear.intercept)
  }

  /** Fit RBF-SVR with D random Fourier features. Defaults mirror sklearn
    * (`RBFSampler`: gamma=1.0, n_components=100 — trimmed to 64 here;
    * `SVR`: C=1, but ε defaults to 0 like [[fit]] for continuity). */
  def fitRbf(df: DataFrame, featureCols: Seq[String], label: String,
             gamma: Double = 1.0, numFeatures: Int = 64, seed: Long = 42L,
             c: Double = 1.0, epsilon: Double = 0.0, smoothing: Double = 1e-3,
             maxIter: Int = 200, tolerance: Double = 1e-6): RbfSvrModel = {
    require(gamma > 0 && numFeatures > 0, "gamma>0, D>0")
    val k = featureCols.size
    val Standardize.Moments(mu, sd, _) = Standardize.moments(df, featureCols, label)
    // java.util.Random's algorithm is specified — same seed, same map on
    // every JVM, so the "random" features are reproducible build-to-build
    val rng = new scala.util.Random(seed)
    val freq = Seq.fill(numFeatures)(
      Seq.fill(k)(rng.nextGaussian() * math.sqrt(2.0 * gamma)))
    val phase = Seq.fill(numFeatures)(rng.nextDouble() * 2.0 * math.Pi)
    val model = RbfSvrModel(freq, phase, mu, sd,
      LinearSvrModel(Seq.fill(numFeatures)(0.0), 0.0, 0.0, 0), gamma)
    val zCols = (0 until numFeatures).map(i => s"__rff$i")
    val mapped = df.select(
      model.featureExprs(featureCols).zip(zCols)
        .map { case (e, n) => e.as(n) } :+ col(label): _*)
      .cache()
    try {
      mapped.count()
      // z-features are already bounded (|zᵢ| ≤ √(2/D)) and centered-ish;
      // standardize handles the label centering and any residual spread
      val lin = fit(mapped, zCols, label, c, epsilon, smoothing,
        maxIter, tolerance, standardize = true)
      model.copy(linear = lin)
    } finally { mapped.unpersist(); () }
  }

  /** Scale → fit raw-path on the z-scaled projection → map back:
    * w_raw = w̃/σ, b_raw = μy + b̃ − Σ w̃ⱼμⱼ/σⱼ. One extra aggregate for
    * the moments; the scaled projection is cached because every L-BFGS
    * evaluation re-scans it. */
  private def fitStandardized(df: DataFrame, featureCols: Seq[String],
                              label: String, c: Double, epsilon: Double,
                              smoothing: Double, maxIter: Int,
                              tolerance: Double): LinearSvrModel = {
    val Standardize.Moments(mu, sd, muY) =
      Standardize.moments(df, featureCols, label)
    val scaled = df.select(
      (featureCols.zipWithIndex.map { case (cn, j) =>
        ((col(cn) - lit(mu(j))) / lit(sd(j))).as(cn) } :+
        (col(label) - lit(muY)).as(label)): _*)
      .cache()
    try {
      scaled.count()
      val m = fit(scaled, featureCols, label, c, epsilon, smoothing,
        maxIter, tolerance, standardize = false)
      val wRaw = m.coefficients.zipWithIndex.map { case (w, j) => w / sd(j) }
      val bRaw = muY + m.intercept -
        m.coefficients.zipWithIndex.map { case (w, j) => w * mu(j) / sd(j) }.sum
      LinearSvrModel(wRaw, bRaw, m.objective, m.evaluations)
    } finally { scaled.unpersist(); () }
  }
}
