package graft.ml

import org.apache.spark.ml.Model
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's deployed model — `ml_ensemble_weighted`
  * (`app.py:115-144`): fit {LinearRegression, Ridge(α=1), RF(100, seed 42)},
  * weight each by max(train R², 0.001), normalize weights, predict the
  * weighted sum; report per-model and ensemble metrics.
  */
object Ensemble {

  final case class Member(name: String, weight: Double, r2: Double, mae: Double,
                          predictions: DataFrame, model: Model[_])

  final case class Fitted(members: Seq[Member], ensemble: DataFrame)

  /** Fit the 3-model ensemble on an assembled training frame.
    *
    * @param train    assembled frame (Models.FeaturesCol + label + idCol)
    * @param label    target column
    * @param idCol    row key used to align member predictions (the
    *                 reference aligns positionally; distributed frames
    *                 need an explicit key — SURVEY.md §1.4.4)
    */
  def fitWeighted(train: DataFrame, label: String, idCol: String): Fitted = {
    val n = train.count()
    val members = Seq(
      "lr" -> Models.ols(label),
      "ridge" -> Models.ridge(label, alpha = 1.0, n = n))
      .map { case (name, est) => (name, est.fit(train): Model[_]) } :+
      ("rf" -> (Models.randomForest(label).fit(train): Model[_]))

    val scored = members.map { case (name, m) =>
      val pred = m.transform(train)
        .select(col(idCol), col(label).as("y"), col(Models.PredictionCol).as("yhat"))
      val s = Evaluation.metricsFull(pred, "y", "yhat").head()
      Member(name, weight = math.max(s.getAs[Double]("r2"), 0.001),
        r2 = s.getAs[Double]("r2"), mae = s.getAs[Double]("mae"),
        predictions = pred, model = m)
    }
    val wsum = members0Sum(scored)
    val normalized = scored.map(m => m.copy(weight = m.weight / wsum))

    // ensemble prediction: Σ wᵢ·ŷᵢ aligned on idCol (inner joins on the
    // shared key; each member frame has identical row set by construction)
    val ens = normalized.map { m =>
      m.predictions.select(col(idCol), col("y"),
        (col("yhat") * m.weight).as(s"w_${m.name}"))
    }.reduce { (a, b) => a.join(b.drop("y"), idCol) }
    val yhat = normalized.map(m => col(s"w_${m.name}")).reduce(_ + _)
    Fitted(normalized, ens.select(col(idCol), col("y"), yhat.as("yhat")))
  }

  private def members0Sum(ms: Seq[Member]): Double = ms.map(_.weight).sum

  /** Per-model + ensemble report frame: (model, weight, r2, mae) rows
    * followed by the ensemble row — the `app.py:517-519` perf table. */
  def report(f: Fitted): Seq[(String, Double, Double, Double)] = {
    val e = Evaluation.metricsFull(f.ensemble, "y", "yhat").head()
    f.members.map(m => (m.name, m.weight, m.r2, m.mae)) :+
      (("ensemble_weighted", 1.0, e.getAs[Double]("r2"), e.getAs[Double]("mae")))
  }
}
