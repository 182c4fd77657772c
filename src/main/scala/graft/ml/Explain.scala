package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model explanation (`ml_shap`, SURVEY.md §2.9): the reference's
  * notebooks rank features with RF importances (`app.py:567-572`); SHAP
  * is the requested but previously-excluded generalization. For LINEAR
  * models the Shapley values are exact and closed-form — under the
  * interventional (feature-independence) value function,
  *
  *   φⱼ(x) = wⱼ·(xⱼ − E[xⱼ]),    base = E[f(X)] = w·μ + b
  *
  * (Lundberg & Lee 2017, "A Unified Approach to Interpreting Model
  * Predictions", §Corollary 1 / Linear SHAP) — no sampling, no
  * background-set approximation. Everything is declarative: one tiny
  * aggregate for μ, then φ columns as codegen'd expressions; the global
  * summary is a second aggregate. Two jobs total at any scale, no
  * per-row UDF, no collect of data rows.
  */
object Explain {

  /** Per-row SHAP columns `shap_<feature>` for a linear model, plus the
    * scalar base value. μ must be the feature means of the background
    * distribution (normally the training frame itself). */
  def linearShapColumns(coefs: Seq[(String, Double)],
                        means: Map[String, Double]): Seq[(String, Column)] =
    coefs.map { case (f, w) =>
      s"shap_$f" -> (lit(w) * (col(f) - lit(means(f)))) }

  /** Feature means over the background frame (one aggregate). */
  def featureMeans(df: DataFrame, featureCols: Seq[String]): Map[String, Double] = {
    val r = df.agg(avg(col(featureCols.head)),
      featureCols.tail.map(c => avg(col(c))): _*).head()
    featureCols.zipWithIndex.map { case (c, i) => c -> r.getDouble(i) }.toMap
  }

  /** Global SHAP summary for a linear model over `df`: per feature the
    * mean |φ| (the standard SHAP importance ranking), mean φ (≈0 over
    * the background frame itself, by construction), and the coefficient.
    * `base` = w·μ + b satisfies Σⱼφⱼ(x) + base = f(x) exactly per row —
    * MlSpec asserts the additivity identity. */
  def linearShapSummary(df: DataFrame, coefs: Seq[(String, Double)],
                        intercept: Double): DataFrame = {
    val means = featureMeans(df, coefs.map(_._1))
    val phis = linearShapColumns(coefs, means)
    val withPhi = df.select(phis.map { case (n, c) => c.as(n) }: _*)
    val aggs = phis.flatMap { case (n, _) =>
      Seq(avg(abs(col(n))).as(s"abs_$n"), avg(col(n)).as(s"mean_$n")) }
    val r = withPhi.agg(aggs.head, aggs.tail: _*).head()
    val base = coefs.map { case (f, w) => w * means(f) }.sum + intercept
    import df.sparkSession.implicits._
    coefs.zipWithIndex.map { case ((f, w), i) =>
      (f, r.getDouble(2 * i), r.getDouble(2 * i + 1), w, base) }
      .toDF("feature", "mean_abs_shap", "mean_shap", "coefficient", "base_value")
  }
}
