package graft.ml

import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.{
  GBTRegressor, LinearRegression, LinearRegressionModel,
  RandomForestRegressor, RandomForestRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib wrappers mirroring the reference's model zoo (SURVEY.md §2.9;
  * `app.py:115-144`, README.md:33-56).
  *
  * sklearn-parity notes baked in here:
  *  - sklearn `LinearRegression` = OLS → `regParam=0`.
  *  - sklearn `Ridge(alpha)` does NOT standardize features; Spark defaults
  *    `standardization=true`, so Ridge MUST set `standardization=false`
  *    for coefficient parity (SURVEY.md §2.9 trap #1). Penalty scaling:
  *    sklearn minimizes ||y−Xw||² + α||w||²; Spark minimizes
  *    (1/n)||y−Xw||² + λ||w||², so λ = α/n reproduces sklearn.
  *  - `RandomForestRegressor(n_estimators=100, random_state=42)` →
  *    `numTrees=100, seed=42`; trees differ from sklearn by construction,
  *    parity is statistical (SURVEY.md §5.2).
  */
object Models {

  val FeaturesCol = "features"
  val PredictionCol = "prediction"

  /** Driver-sized bound for the iterative fitters' adaptive evaluation
    * path (Svr/Mlp): a training frame at or under this row count is
    * collected ONCE and each L-BFGS evaluation folds the same Aggregator
    * on the driver — the day-grain modeling tables are bounded far below
    * this at ANY corpus SF, while row-level fits over raw facts exceed it
    * and keep the one-distributed-aggregation-per-evaluation loop.
    * 64k rows × (k+1) doubles is single-digit MB on the driver. */
  val MaxDriverFitRows: Long = 1L << 16

  /** Assemble feature columns into the MLlib vector column. */
  def assemble(df: DataFrame, featureCols: Seq[String]): DataFrame =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol(FeaturesCol)
      .transform(df)

  /** `ml_scaler` (`slide13.xml` normalization): fit+apply z-scaling on the
    * assembled vector. */
  def standardScale(assembled: DataFrame, outCol: String = "scaled"): DataFrame =
    new StandardScaler()
      .setInputCol(FeaturesCol).setOutputCol(outCol)
      .setWithMean(true).setWithStd(true)
      .fit(assembled).transform(assembled)

  /** `ml_linear_regression` (`app.py:121`): plain OLS. */
  def ols(label: String): LinearRegression =
    new LinearRegression()
      .setFeaturesCol(FeaturesCol).setLabelCol(label)
      .setRegParam(0.0).setElasticNetParam(0.0)
      .setSolver("normal")

  /** Run independent fit/score tasks on parallel driver threads — a
    * SparkSession schedules jobs from multiple threads safely, and serial
    * MLlib fits leave the cluster mostly idle between jobs. Daemon
    * threads: a non-daemon pool keeps a forked JVM alive after main. */
  def inParallel[A](tasks: Seq[() => A]): Seq[A] = {
    implicit val ec: scala.concurrent.ExecutionContext = fitPool
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(
        tasks.map(t => scala.concurrent.Future(t()))),
      scala.concurrent.duration.Duration.Inf)
  }

  private lazy val fitPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(4,
        (r: Runnable) => {
          val t = new Thread(r, "graft-fit")
          t.setDaemon(true)
          t
        }))

  /** Label statistics the sklearn-parity penalty rescales need: training
    * row count and POPULATION std of the label (one tiny aggregate). */
  def labelStats(df: DataFrame, label: String): (Long, Double) = {
    val r = df.agg(count(lit(1)).as("n"), stddev_pop(col(label)).as("sy")).head()
    (r.getLong(0), r.getDouble(1))
  }

  /** MLlib's REAL regularization semantics with `standardization=false`,
    * mapped empirically against closed forms (both the WLS "normal" and
    * quasi-newton paths agree, exact to ~1e-8 on synthetic fixtures, and
    * invariant under label rescaling): writing Spark's objective as
    *   1/(2n)·||y−Xw−b||² + L1·||w||₁ + (L2/2)·||w||²
    * a `(regParam=λ, elasticNetParam=ρ)` setting yields
    *   L1 = λ·ρ            (exactly the documented value)
    *   L2 = λ·(1−ρ)/σy     (σy = POPULATION std of the label — MLlib
    *                        internally standardizes the label and the L2
    *                        penalty inherits the 1/σy factor; the L1 part
    *                        is compensated, the L2 part is not)
    * The factories below invert this law so the fitted coefficients match
    * sklearn's documented objectives; GoldenParitySpec pins the result
    * against closed-form constants on the real reference data. */

  /** `ml_ridge` (`app.py:122`, alpha=1.0): sklearn Ridge minimizes
    * ||y−Xw−b||² + α·||w||² (squared loss NOT divided by n), i.e.
    * L2_target = α/n ⇒ regParam = α·σy/n. */
  def ridge(label: String, alpha: Double, n: Long, yStdPop: Double): LinearRegression = {
    require(yStdPop > 0, "constant label: ridge penalty rescale undefined")
    new LinearRegression()
      .setFeaturesCol(FeaturesCol).setLabelCol(label)
      .setRegParam(alpha * yStdPop / n).setElasticNetParam(0.0)
      .setStandardization(false)
      .setSolver("normal")
  }

  /** `ml_lasso` / `ml_elasticnet` (README:34). sklearn minimizes
    * 1/(2n)·||y−Xw−b||² + α·ρ·||w||₁ + α·(1−ρ)/2·||w||², i.e.
    * L1_target = αρ and L2_target = α(1−ρ) ⇒
    *   λ = αρ + α(1−ρ)·σy,  ρ' = αρ/λ
    * (for ρ=1 this is plain regParam=α — lasso needs NO rescale; the old
    * α/n rescale was n× too weak and is exactly the class of bug the
    * closed-form tests in MlSpec now catch). */
  def elasticNet(label: String, alpha: Double, l1Ratio: Double,
                 yStdPop: Double): LinearRegression = {
    require(l1Ratio == 1.0 || yStdPop > 0,
      "constant label: elastic-net L2 rescale undefined")
    val lambda = alpha * l1Ratio + alpha * (1.0 - l1Ratio) * yStdPop
    val rho = if (lambda == 0) 0.0 else alpha * l1Ratio / lambda
    new LinearRegression()
      .setFeaturesCol(FeaturesCol).setLabelCol(label)
      .setRegParam(lambda).setElasticNetParam(rho)
      .setStandardization(false)
      .setMaxIter(500).setTol(1e-9)
  }

  /** `ml_random_forest` (`app.py:123`,
    * `RandomForestRegressor(n_estimators=100, random_state=42)`).
    * sklearn-parity config (trees still differ by construction, so parity
    * is statistical — SURVEY.md §5.2): sklearn grows unbounded trees on
    * ALL features (`max_features=1.0`); Spark defaults to depth 5 and
    * one-third feature subsetting for regression, which underfits
    * dramatically relative to sklearn. maxDepth=30 is MLlib's ceiling
    * (≈ unbounded at reference-scale n), featureSubsetStrategy="all"
    * matches sklearn's default, maxBins=128 narrows the split-candidate
    * discretization gap (sklearn uses exact splits).
    *
    * cacheNodeIds=true is a pure optimization (the trained trees are
    * bit-identical — checksum-verified): rows keep their node id in a
    * cached RDD instead of re-routing through the partially-built trees
    * every level, which both skips the per-row predictImpl traversal and
    * stops the growing tree topology from riding each iteration's
    * closure through the Java serializer (the profiled 40 % of fit wall
    * time on the fine frame — BENCH_TRIAGE_r13.md). */
  def randomForest(label: String, numTrees: Int = 100, seed: Long = 42,
                   maxDepth: Int = 30, maxBins: Int = 128): RandomForestRegressor =
    new RandomForestRegressor()
      .setFeaturesCol(FeaturesCol).setLabelCol(label)
      .setNumTrees(numTrees).setSeed(seed)
      .setMaxDepth(maxDepth).setMaxBins(maxBins)
      .setFeatureSubsetStrategy("all")
      .setCacheNodeIds(true)

  /** `ml_gbt` (stands in for GradientBoosting/XGB/LGBM, `slide20.xml`).
    * cacheNodeIds measured a wash here (depth-5 trees route cheaply;
    * checksum-identical either way) — left at the default. */
  def gbt(label: String, maxIter: Int = 50, seed: Long = 42): GBTRegressor =
    new GBTRegressor()
      .setFeaturesCol(FeaturesCol).setLabelCol(label)
      .setMaxIter(maxIter).setSeed(seed)

  /** RF feature importances as a (feature, importance) frame
    * (`app.py:567-572`). */
  def featureImportances(model: RandomForestRegressionModel,
                         featureCols: Seq[String]): Seq[(String, Double)] = {
    val imp = model.featureImportances.toArray
    featureCols.zip(imp)
  }

  /** Linear-model coefficients as (feature, coefficient) + intercept. */
  def coefficients(model: LinearRegressionModel,
                   featureCols: Seq[String]): (Seq[(String, Double)], Double) =
    (featureCols.zip(model.coefficients.toArray), model.intercept)
}
