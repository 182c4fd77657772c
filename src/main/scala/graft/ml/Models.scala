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

  /** `ml_ridge` (`app.py:122`, alpha=1.0): see standardization note above.
    * `n` is the training row count (sklearn→Spark penalty rescale). */
  def ridge(label: String, alpha: Double, n: Long): LinearRegression =
    new LinearRegression()
      .setFeaturesCol(FeaturesCol).setLabelCol(label)
      .setRegParam(alpha / n).setElasticNetParam(0.0)
      .setStandardization(false)
      .setSolver("normal")

  /** `ml_lasso` / `ml_elasticnet` (README:34). Penalty scaling differs
    * from [[ridge]]: sklearn's Lasso/ElasticNet objective ALREADY divides
    * the squared loss by n (sklearn Ridge does not) —
    *   sklearn: 1/(2n)·||y−Xw||² + α(ρ||w||₁ + (1−ρ)/2·||w||²)
    *   Spark:   1/(2n)·||y−Xw||² + λ(ρ||w||₁ + (1−ρ)/2·||w||²)
    * so parity is λ = α exactly; an α/n rescale here would make the
    * penalty n× too weak (degenerating toward OLS on any non-tiny frame).
    * Closed-form parity is proven in MlSpec's soft-threshold test. */
  def elasticNet(label: String, alpha: Double, l1Ratio: Double): LinearRegression =
    new LinearRegression()
      .setFeaturesCol(FeaturesCol).setLabelCol(label)
      .setRegParam(alpha).setElasticNetParam(l1Ratio)
      .setStandardization(false)

  /** `ml_random_forest` (`app.py:123`). */
  def randomForest(label: String, numTrees: Int = 100, seed: Long = 42): RandomForestRegressor =
    new RandomForestRegressor()
      .setFeaturesCol(FeaturesCol).setLabelCol(label)
      .setNumTrees(numTrees).setSeed(seed)

  /** `ml_gbt` (stands in for GradientBoosting/XGB/LGBM, `slide20.xml`). */
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
