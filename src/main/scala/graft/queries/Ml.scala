package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Ensemble, Evaluation, Models, ModelingFrame}

/** MLlib query registry (SURVEY.md §2.9). These are NOT SQL-expressible
  * (DuckDB has no multi-feature OLS/RF/GBT), so they are registered
  * without oracle SQL → the driver records the weaker rows-only check;
  * numeric correctness is covered by ScalaTest (closed-form OLS on a
  * planted linear dataset, metric identities, seeded-RF determinism).
  */
object Ml {

  type Q = (SparkSession, String) => DataFrame

  private def round6(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((acc, c) => acc.withColumn(c, round(col(c), 6)))

  val qs: Map[String, Q] = Map(
    "ml_ensemble_weighted" -> ((s, d) => {
      import s.implicits._
      val f = Ensemble.fitWeighted(ModelingFrame.assembled(s, d),
        ModelingFrame.Target, "date_id")
      round6(Ensemble.report(f).toDF("model", "weight", "r2", "mae"),
        Seq("weight", "r2", "mae")).orderBy("model")
    }),

    "ml_ridge" -> ((s, d) => {
      import s.implicits._
      val train = ModelingFrame.assembled(s, d)
      val m = Models.ridge(ModelingFrame.Target, alpha = 1.0, n = train.count())
        .fit(train)
      val (coefs, intercept) = Models.coefficients(m, ModelingFrame.EventTypes)
      round6((coefs :+ (("__intercept", intercept))).toDF("feature", "coefficient"),
        Seq("coefficient")).orderBy("feature")
    }),

    "ml_random_forest" -> ((s, d) => {
      import s.implicits._
      val train = ModelingFrame.assembled(s, d)
      val m = Models.randomForest(ModelingFrame.Target).fit(train)
      round6(Models.featureImportances(m, ModelingFrame.EventTypes)
          .toDF("feature", "importance"), Seq("importance"))
        .orderBy("feature")
    }),

    "ml_gbt" -> ((s, d) => {
      val train = ModelingFrame.assembled(s, d)
      val m = Models.gbt(ModelingFrame.Target, maxIter = 20).fit(train)
      val pred = m.transform(train).select(col("date_id"),
        col(ModelingFrame.Target).as("y"), col(Models.PredictionCol).as("yhat"))
      round6(Evaluation.metricsFull(pred, "y", "yhat"),
        Seq("mae", "rmse", "r2", "mape", "smape", "dir_acc"))
    }),

    "ml_scaler" -> ((s, d) => {
      import s.implicits._
      val scaled = Models.standardScale(ModelingFrame.assembled(s, d))
      // verify contract: per-feature mean ≈ 0, stddev ≈ 1 on the scaled vec
      val asArr = scaled.select(
        org.apache.spark.ml.functions.vector_to_array(col("scaled")).as("v"))
      val stats = ModelingFrame.EventTypes.indices.flatMap { i =>
        Seq(avg(element_at(col("v"), i + 1)).as(s"mean_$i"),
          stddev_samp(element_at(col("v"), i + 1)).as(s"std_$i"))
      }
      val r = asArr.agg(stats.head, stats.tail: _*).head()
      ModelingFrame.EventTypes.indices.map(i =>
          (ModelingFrame.EventTypes(i),
            math.rint(r.getAs[Double](s"mean_$i") * 1e6) / 1e6,
            math.rint(r.getAs[Double](s"std_$i") * 1e6) / 1e6))
        .toDF("feature", "scaled_mean", "scaled_std").orderBy("feature")
    }),

    "ml_walk_forward" -> ((s, d) => {
      import s.implicits._
      val df = ModelingFrame.assembled(s, d)
      val cuts = Evaluation.timeCuts(df, "date_id", 3)
      val folds = Evaluation.walkForwardSplits(df, "date_id", cuts)
      val rows = folds.zipWithIndex.flatMap { case ((train, test), i) =>
        if (train.isEmpty || test.isEmpty) None
        else {
          val m = Models.ols(ModelingFrame.Target).fit(train)
          val pred = m.transform(test).select(
            col(ModelingFrame.Target).as("y"), col(Models.PredictionCol).as("yhat"))
          val r = Evaluation.metricsFull(pred, "y", "yhat").head()
          Some((i, r.getAs[Long]("n"),
            math.rint(r.getAs[Double]("rmse") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("mae") * 1e6) / 1e6))
        }
      }
      rows.toDF("fold", "n_test", "rmse", "mae").orderBy("fold")
    }),

    "ml_gridsearch" -> ((s, d) => {
      import s.implicits._
      val df = ModelingFrame.assembled(s, d)
      val n = df.count()
      val cuts = Evaluation.timeCuts(df, "date_id", 2)
      val folds = Evaluation.walkForwardSplits(df, "date_id", cuts)
        .filter { case (tr, te) => !tr.isEmpty && !te.isEmpty }
      val grid = Seq(0.01, 0.1, 1.0, 10.0)
      val scores = grid.map { alpha =>
        val rmses = folds.map { case (train, test) =>
          val m = Models.ridge(ModelingFrame.Target, alpha, n).fit(train)
          val pred = m.transform(test).select(
            col(ModelingFrame.Target).as("y"), col(Models.PredictionCol).as("yhat"))
          Evaluation.metricsFull(pred, "y", "yhat").head().getAs[Double]("rmse")
        }
        (alpha, math.rint(rmses.sum / rmses.size * 1e6) / 1e6)
      }
      val best = scores.minBy(_._2)._1
      scores.map { case (a, r) => (a, r, a == best) }
        .toDF("alpha", "mean_rmse", "is_best").orderBy("alpha")
    }),
  )

  /** No oracle SQL — rows-only checks by design (see object Scaladoc). */
  val sql: Map[String, String] = Map.empty
}
