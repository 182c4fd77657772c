package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ml.{Ensemble, Evaluation, Explain, Garch, GroupedOls, GroupedOlsStats, Hmm, HoltWinters, Mlp, Models, ModelingFrame, Pca, Quantile, Sarimax, Svr}
import graft.operators.TimeSeries

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

  /** Every fit re-scans its training frame several times (WLS/tree passes
    * + metric aggregates); the events→daily pivot would re-run per pass.
    * Cache the tiny assembled frame for the query's duration.
    *
    * `coalesce(1)`: the day-level frame is a few hundred rows at any SF,
    * but it inherits 32 shuffle partitions from the pivot — and iterative
    * fits (GBT ≈ maxIter·depth sequential jobs, OWL-QN up to maxIter
    * treeAggregates) then pay 32-task scheduling overhead PER PASS for
    * zero parallelism gain. One partition makes each pass one task. The
    * heavy distributed work (the events scan + pivot) happens upstream of
    * the coalesce and keeps full parallelism. */
  private def withFrame[A](s: SparkSession, d: String)(f: DataFrame => A): A = {
    val frame = ModelingFrame.assembled(s, d).coalesce(1).cache()
    try f(frame) finally { frame.unpersist(); () }
  }

  /** Same contract on the 30-MINUTE frame (`ModelingFrame.buildFine`) —
    * the frame the iterative rows-only fits (ensemble/RF/GBT/SVR/MLP/
    * isotonic/lasso) train on, so they exercise 10³+ rows on the
    * harness's fixed ~30-day span instead of a ~29-row day-grain
    * degenerate. The oracle-backed fits (ridge/scaler/shap/walk-forward/
    * gridsearch) stay on [[withFrame]]: their DuckDB twins replay the
    * day-grain frame and grain is orthogonal to what they verify. */
  private def withFineFrame[A](s: SparkSession, d: String)(f: DataFrame => A): A = {
    val frame = ModelingFrame.assembledFine(s, d).coalesce(1).cache()
    try f(frame) finally { frame.unpersist(); () }
  }

  /** Shared ACF moment pipeline (`ml_acf` / `ml_pacf`): grid-6 daily
    * click means, grid-6 global mean riding the broadcast 1-row pattern,
    * DECIMAL-exact centered products — one lead-window pass, one
    * aggregation; the result is a 1-row (den, num₁..num_K) frame. */
  private def acfMoments(s: SparkSession, d: String, maxLag: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d).filter(col("event_type") === "click")
      .withColumn("date_id", Tables.epochDay(col("ts")))
      .groupBy("date_id").agg(Grid.mean6(col("value")).as("x"))
    val mu = daily.agg(Grid.mean6(col("x")).as("mu"))
    val w = Window.orderBy("date_id")
    val cent = daily.crossJoin(broadcast(mu))
      .select(col("date_id"),
        (col("x").cast("decimal(18,6)") - col("mu").cast("decimal(18,6)")).as("c"))
    val led = (1 to maxLag).foldLeft(cent)((df, k) =>
      df.withColumn(s"c$k", lead(col("c"), k).over(w)))
    val aggs = sum((col("c") * col("c")).cast("decimal(30,12)")).as("den") +:
      (1 to maxLag).map(k =>
        sum((col("c") * col(s"c$k")).cast("decimal(30,12)")).as(s"num$k"))
    led.agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB twin of [[acfMoments]] — CTE bodies `daily, m, c, l, a`
    * (caller supplies the `WITH`): same grid-6 means, DECIMAL-exact
    * centered products, identical column names. */
  private def acfMomentsSql(maxLag: Int): String = {
    val leads = (1 to maxLag).map(k =>
      s"lead(c, $k) OVER (ORDER BY date_id) AS c$k").mkString(",\n        ")
    val nums = (1 to maxLag)
      .map(k => s"sum(CAST(c*c$k AS DECIMAL(30,12))) AS num$k").mkString(", ")
    s"""daily AS (
       |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS date_id,
       |    round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value), 6) AS x
       |  FROM events WHERE event_type = 'click' GROUP BY 1),
       |m AS (SELECT round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(x), 6) AS mu FROM daily),
       |c AS (SELECT date_id, CAST(x AS DECIMAL(18,6)) - CAST(mu AS DECIMAL(18,6)) AS c FROM daily, m),
       |l AS (SELECT c,
       |        $leads
       |      FROM c),
       |a AS (SELECT sum(CAST(c*c AS DECIMAL(30,12))) AS den, $nums FROM l)""".stripMargin
  }

  val qs: Map[String, Q] = Map(
    "ml_ensemble_weighted" -> ((s, d) => {
      import s.implicits._
      withFineFrame(s, d) { train =>
        val f = Ensemble.fittedCached(s, d, ModelingFrame.Target, train,
          grain = "fine30m", rfMaxDepth = ModelingFrame.FineRfMaxDepth)
        round6(Ensemble.report(f, train, ModelingFrame.Target,
            fitKey = Some((d, ModelingFrame.Target, "fine30m", 100)))
            .toDF("model", "weight", "r2", "mae"),
          Seq("weight", "r2", "mae")).orderBy("model")
      }
    }),

    "ml_ridge" -> ((s, d) => {
      import s.implicits._
      withFrame(s, d) { train =>
        val (n, sy) = Models.labelStats(train, ModelingFrame.Target)
        val m = Models.ridge(ModelingFrame.Target, alpha = 1.0, n = n, yStdPop = sy)
          .fit(train)
        val (coefs, intercept) = Models.coefficients(m, ModelingFrame.EventTypes)
        round6((coefs :+ (("__intercept", intercept))).toDF("feature", "coefficient"),
          Seq("coefficient")).orderBy("feature")
      }
    }),

    "ml_random_forest" -> ((s, d) => {
      import s.implicits._
      withFineFrame(s, d) { train =>
        // the ensemble's RF member IS this query's forest (same frame,
        // trees, depth, seed) — share one fit through the ensemble cache
        // instead of training 100 trees twice per session
        val f = Ensemble.fittedCached(s, d, ModelingFrame.Target, train,
          grain = "fine30m", rfMaxDepth = ModelingFrame.FineRfMaxDepth)
        val imps = f.members.find(_.name == "rf").get.scorer match {
          case Ensemble.ForestScorer(m) =>
            ModelingFrame.EventTypes.zip(m.importances.toSeq)
          case Ensemble.MlScorer(m) =>
            Models.featureImportances(
              m.asInstanceOf[org.apache.spark.ml.regression.RandomForestRegressionModel],
              ModelingFrame.EventTypes)
        }
        round6(imps.toDF("feature", "importance"), Seq("importance"))
          .orderBy("feature")
      }
    }),

    "ml_gbt" -> ((s, d) => {
      import s.implicits._
      withFineFrame(s, d) { train =>
        val m = Models.gbt(ModelingFrame.Target, maxIter = 20).fit(train)
        val pred = m.transform(train).select(col("bucket_id"),
          col(ModelingFrame.Target).as("y"), col(Models.PredictionCol).as("yhat"))
        val r = Evaluation.metricsFull(pred, "y", "yhat").head()
        Seq((r.getAs[Long]("n"),
            math.rint(r.getAs[Double]("mae") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("rmse") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("r2") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("dir_acc") * 1e6) / 1e6))
          .toDF("n", "mae", "rmse", "r2", "dir_acc")
      }
    }),

    "ml_scaler" -> ((s, d) => withFrame(s, d) { frame =>
      import s.implicits._
      val scaled = Models.standardScale(frame)
      // verify contract: per-feature mean ≈ 0, stddev ≈ 1 on the scaled vec
      val asArr = scaled.select(
        org.apache.spark.ml.functions.vector_to_array(col("scaled")).as("v"))
      val stats = ModelingFrame.EventTypes.indices.flatMap { i =>
        Seq(avg(element_at(col("v"), i + 1)).as(s"mean_$i"),
          stddev_samp(element_at(col("v"), i + 1)).as(s"std_$i"))
      }
      val r = asArr.agg(stats.head, stats.tail: _*).head()
      // + 0.0 canonicalizes -0.0 (a tiny negative mean rounds to -0.0,
      // which is bit-distinct from the oracle's 0.0 under hash compare)
      ModelingFrame.EventTypes.indices.map(i =>
          (ModelingFrame.EventTypes(i),
            math.rint(r.getAs[Double](s"mean_$i") * 1e6) / 1e6 + 0.0,
            math.rint(r.getAs[Double](s"std_$i") * 1e6) / 1e6 + 0.0))
        .toDF("feature", "scaled_mean", "scaled_std").orderBy("feature")
    }),

    /** HUBER robust regression on the 30-minute frame — the
      * outlier-tolerant member of the linear family (OLS's L2 loss
      * hands a single fat-tailed bar unbounded leverage; Huber's
      * c-switch caps it at linear). FULL ORACLE (r15): the textbook
      * FIXED-SCALE IRLS M-estimator — OLS start (the influence-oracle
      * closed form: exact DECIMAL moments + shared-order no-pivot
      * Cholesky), robust scale c = 1.35·(median|r_OLS|/0.6745) (the
      * MAD-consistency constant), then FOUR weighted-least-squares
      * steps with the Huber weights w = min(1, c/|r|) — w is CONTINUOUS
      * at the switch, so the one discrete-looking branch carries no
      * knife-edge. Every step is ONE distributed moment aggregate; the
      * oracle replays the whole chain (OLS solve → scale → 4 weighted
      * solves) expression for expression in [[huberSql]]. Output:
      * per-feature coefficients next to the OLS fit's on the SAME
      * frame, plus each model's MAE — the robustness comparison a desk
      * actually reads. MlSpec keeps the planted-outlier law. */
    "ml_huber" -> ((s, d) => {
      import s.implicits._
      import java.math.{BigDecimal => JBD}
      val feats = ModelingFrame.EventTypes
      // ONE collect of the calendar-bounded frame (the ml_pacf bound),
      // then a DRIVER REPLAY of the whole chain — every replay
      // primitive (decimal casts, median interpolation, shared-order
      // Cholesky, the weight formula, the step count) lives in
      // [[IrlsCore]], the SAME object [[huberSql]] generates the DuckDB
      // twin from (VERDICT r15 #5: one source of truth, an edit moves
      // both sides or neither)
      val rows = ModelingFrame.buildFine(s, d)
        .select(col(ModelingFrame.Target).as("y") +: feats.map(col): _*)
        .collect()
        .map(r => (r.getDouble(0), Array.tabulate(feats.size + 1)(i =>
          if (i == 0) 1.0 else r.getDouble(i))))
      val p = feats.size + 1
      // OLS start — folded WITHOUT the ×w factor (the oracle's
      // `xi * xj` text, not `xi * xj * w`)
      val bOls = { val (h, g) = IrlsCore.olsMoments(rows, p); IrlsCore.solve(h, g) }
      // robust scale from the OLS residuals (MAD-consistent)
      val s0 = IrlsCore.median50(rows.map { case (y, x) =>
        math.abs(y - IrlsCore.pred(bOls, x)) }.sorted)
      val c = IrlsCore.HuberTuning * (s0 / IrlsCore.MadConsistency)
      var b = bOls
      for (_ <- 1 to IrlsCore.HuberSteps) {
        val bc = b
        val (h, g) = IrlsCore.moments(rows, p) { (y, x) =>
          IrlsCore.huberWeight(c)(math.abs(y - IrlsCore.pred(bc, x)))
        }
        b = IrlsCore.solve(h, g)
      }
      // MAE of both fits: exact-decimal sums of 1e-9-gridded |resid|
      var sah = JBD.ZERO; var sao = JBD.ZERO
      rows.foreach { case (y, x) =>
        sah = sah.add(IrlsCore.d9(math.abs(y - IrlsCore.pred(b, x))))
        sao = sao.add(IrlsCore.d9(math.abs(y - IrlsCore.pred(bOls, x))))
      }
      val n = rows.length.toDouble
      def r6(v: Double) =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      val names = "__intercept" +: feats
      val out = names.zipWithIndex.map { case (nm, i) =>
        (nm, r6(b(i)), r6(bOls(i)))
      } :+ (("__mae", r6(sah.doubleValue / n), r6(sao.doubleValue / n)))
      out.toDF("feature", "huber", "ols").orderBy("feature")
    }),

    "ml_lasso" -> ((s, d) => {
      import s.implicits._
      withFineFrame(s, d) { train =>
        val m = Models.elasticNet(ModelingFrame.Target, alpha = 0.1, l1Ratio = 1.0,
          yStdPop = Models.labelStats(train, ModelingFrame.Target)._2).fit(train)
        val (coefs, intercept) = Models.coefficients(m, ModelingFrame.EventTypes)
        round6((coefs :+ (("__intercept", intercept))).toDF("feature", "coefficient"),
          Seq("coefficient")).orderBy("feature")
      }
    }),

    "ml_elasticnet" -> ((s, d) => {
      import s.implicits._
      withFineFrame(s, d) { train =>
        val m = Models.elasticNet(ModelingFrame.Target, alpha = 0.1, l1Ratio = 0.5,
          yStdPop = Models.labelStats(train, ModelingFrame.Target)._2).fit(train)
        val (coefs, intercept) = Models.coefficients(m, ModelingFrame.EventTypes)
        round6((coefs :+ (("__intercept", intercept))).toDF("feature", "coefficient"),
          Seq("coefficient")).orderBy("feature")
      }
    }),

    /** SARIMA stand-in (SURVEY.md §2.9 `ml_sarima`: no MLlib ARIMA; the
      * hybrid's value was the regression part): AR(3) via OLS on lagged
      * daily click means + 1-step-ahead forecast from the latest lags. */
    "ml_ar_forecast" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("date_id")
      val series = graft.operators.TimeSeries.lagFeatures(
          ModelingFrame.daily(s, d).select("date_id", "click"),
          Nil, Seq(col("date_id")), "click", Seq(1, 2, 3))
        .na.drop("any").coalesce(1).cache()
      try {
        val lags = Seq("click_lag1", "click_lag2", "click_lag3")
        val train = Models.assemble(series, lags)
        val m = Models.ols("click").fit(train)
        val latest = series.orderBy(desc("date_id")).limit(1)
          .select(col("click").as("click_lag1"), col("click_lag1").as("click_lag2"),
            col("click_lag2").as("click_lag3"))
        val forecast = m.transform(Models.assemble(latest, lags))
          .select(Models.PredictionCol).head().getDouble(0)
        val r2 = m.summary.r2
        Seq((math.rint(forecast * 1e6) / 1e6, math.rint(r2 * 1e6) / 1e6))
          .toDF("forecast_next", "train_r2")
      } finally { series.unpersist(); () }
    }),

    /** `ml_sarima` (SURVEY.md §2.9, `slide21-22.xml`): SARIMA(3,1,0)(1,0,0)_7
      * as conditional least squares on the seasonal design — differencing +
      * AR/seasonal lags built in one window pass (TimeSeries.seasonalDesign),
      * OLS fit distributed, 1-step forecast reconstructed by undoing the
      * differencing (ŷ_{T+1} = y_T + v̂_{T+1}). Metrics are on the
      * differenced scale — the honest forecasting scale. */
    "ml_sarima" -> ((s, d) => {
      import s.implicits._
      val so = TimeSeries.SeasonalOrder(p = 3, d = 1, P = 1, D = 0, s = 7)
      val series = ModelingFrame.daily(s, d).select("date_id", "click")
      val design = TimeSeries.seasonalDesign(series, Nil, Seq(col("date_id")), "click", so)
        .na.drop("any").coalesce(1).cache()
      try {
        val feats = so.lagCols.map(_._1)
        val m = Models.ols("sar_y").fit(Models.assemble(design, feats))
        // tail of the series, newest first — enough rows to read
        // v_{T+1-k} for every design lag (driver-sized: ≤ P·s rows)
        val maxLag = so.lagCols.map(_._2).max
        val tail = design.orderBy(desc("date_id")).limit(maxLag)
          .select("date_id", "sar_y", "click")
          .collect().sortBy(-_.getAs[Int]("date_id"))
        val forecast = TimeSeries.forecastNext(so, m.intercept,
          m.coefficients.toArray.toSeq,
          tail.map(_.getAs[Double]("sar_y")).toSeq,
          tail.map(_.getAs[Double]("click")).toSeq)
        Seq((math.rint(forecast * 1e6) / 1e6,
          math.rint(m.summary.r2 * 1e6) / 1e6, so.p, so.d, so.P, so.D, so.s))
          .toDF("forecast_next", "train_r2", "p", "d", "big_p", "big_d", "s")
      } finally { design.unpersist(); () }
    }),

    /** SARIMA+Ridge hybrid (`slide22.xml`: the reference's best classical
      * model, R² ≈ 0.42 / dir-acc ≈ 0.72 on its data): seasonal-AR on the
      * target series, then sklearn-parity Ridge on the LAG-1 exogenous
      * features fitted to the AR residuals (contemporaneous exog would
      * leak); hybrid prediction = AR + residual-ridge. Output mirrors the
      * slide's comparison table: (model, r2, dir_acc) rows. */
    "ml_sarima_hybrid" -> ((s, d) => {
      import s.implicits._
      val so = TimeSeries.SeasonalOrder(p = 3, d = 1, P = 1, D = 0, s = 7)
      val exogBase = ModelingFrame.EventTypes.filterNot(_ == "click")
      val w = org.apache.spark.sql.expressions.Window.orderBy("date_id")
      val daily = ModelingFrame.daily(s, d)
      val withExog = exogBase.foldLeft(daily) { (acc, c) =>
        acc.withColumn(s"${c}_lag1", lag(col(c), 1).over(w))
      }
      val exog = exogBase.map(c => s"${c}_lag1")
      val design = TimeSeries.seasonalDesign(withExog, Nil, Seq(col("date_id")), "click", so)
        .na.drop("any", Seq("sar_y") ++ so.lagCols.map(_._1) ++ exog).coalesce(1).cache()
      try {
        val sarFit = Models.ols("sar_y").fit(Models.assemble(design, so.lagCols.map(_._1)))
        val withSar = sarFit.transform(Models.assemble(design, so.lagCols.map(_._1)))
          .withColumnRenamed(Models.PredictionCol, "yhat_sar")
          .withColumn("resid", col("sar_y") - col("yhat_sar"))
          .drop(Models.FeaturesCol).cache()
        try {
          val (n, sy) = Models.labelStats(withSar, "resid")
          val ridgeFit = Models.ridge("resid", alpha = 1.0, n = n, yStdPop = sy)
            .fit(Models.assemble(withSar, exog))
          val scored = ridgeFit.transform(Models.assemble(withSar, exog))
            .withColumn("yhat_hybrid", col("yhat_sar") + col(Models.PredictionCol))
            .cache() // two metric aggregates read it; don't re-run the transform
          try {
            def m(yhat: String) = {
              val r = Evaluation.metricsFull(
                scored.select(col("sar_y").as("y"), col(yhat).as("yhat")), "y", "yhat").head()
              (r.getAs[Double]("r2"), r.getAs[Double]("dir_acc"))
            }
            val (sarR2, sarDa) = m("yhat_sar")
            val (hybR2, hybDa) = m("yhat_hybrid")
            round6(Seq(("sar", sarR2, sarDa), ("sar_ridge_hybrid", hybR2, hybDa))
              .toDF("model", "r2", "dir_acc"), Seq("r2", "dir_acc")).orderBy("model")
          } finally { scored.unpersist(); () }
        } finally { withSar.unpersist(); () }
      } finally { design.unpersist(); () }
    }),

    /** `ml_sarimax` (SURVEY.md §2.9; `Marilyn_Cleaning.ipynb:34 (cell 1)`
      * statsmodels SARIMAX, results `slide21-22.xml`): exact state-space
      * MLE for ARIMA(1,1,1)×(1,0,1)₇ on the daily click series — Kalman
      * filter with stationary initialization, σ² concentrated, PACF
      * transform enforcing stationarity + invertibility (see
      * `ml/Sarimax.scala`). This is the TRUE-MA upgrade over `ml_sarima`'s
      * conditional-least-squares AR form, which stays registered as the
      * distributed-regression twin. The daily aggregation is the
      * distributed stage; the series itself is collected (driver-sized:
      * one row per day, the same bound as every `withFrame` fit — a
      * Kalman pass is serial by nature, exactly like statsmodels).
      * Rows-only: no SQL engine computes a Kalman MLE; MlSpec pins the
      * filter against the closed-form ARMA Gaussian likelihood and the
      * MLE against simulated ground truth. */
    "ml_sarimax" -> ((s, d) => {
      import s.implicits._
      val y = ModelingFrame.daily(s, d).select("date_id", "click")
        .na.drop("any").orderBy("date_id")
        .collect().map(_.getDouble(1))
      val order = Sarimax.Order(p = 1, d = 1, q = 1, P = 1, D = 0, Q = 1, s = 7)
      val f = Sarimax.fit(y, order)
      def r6(v: Double) = math.rint(v * 1e6) / 1e6
      Seq((r6(f.ar.head), r6(f.ma.head), r6(f.sar.head), r6(f.sma.head),
          r6(f.sigma2), r6(f.logLik), r6(f.aic), r6(f.forecastNext), f.nObs))
        .toDF("ar1", "ma1", "sar1", "sma1", "sigma2", "loglik", "aic",
          "forecast_next", "n_obs")
    }),

    /** `ml_sarimax_select`: AIC order selection over state-space fits —
      * the statsmodels workflow the reference's notebook follows (pick
      * SARIMAX orders by information criterion, `Marilyn_Cleaning.ipynb`
      * cell 34's fitted order). Six candidate ARIMA(p,1,q)×(P,0,Q)₇
      * orders fit by exact Kalman-filter MLE (`ml/Sarimax.scala`) on the
      * daily click series; output is the ranked AIC table with the
      * winner flagged — ties broken toward the smaller model, the
      * parsimony rule every selection loop uses. Independent fits run on
      * parallel driver threads (driver-side math like statsmodels; the
      * distributed stage is the events→daily collapse). Rows-only: AIC
      * law, winner determinism and grid shape pinned in SarimaxSpec. */
    "ml_sarimax_select" -> ((s, d) => {
      import s.implicits._
      val y = ModelingFrame.daily(s, d).select("date_id", "click")
        .na.drop("any").orderBy("date_id")
        .collect().map(_.getDouble(1))
      val grid = Seq((1, 0, 0, 0), (0, 1, 0, 0), (1, 1, 0, 0),
        (1, 0, 1, 1), (0, 1, 1, 1), (1, 1, 1, 1))
      val fits = Models.inParallel(grid.map { case (p, q, sp, sq) => () =>
        val f = Sarimax.fit(y, Sarimax.Order(p = p, d = 1, q = q, P = sp, D = 0, Q = sq, s = 7))
        (p, q, sp, sq, f)
      })
      val bestAic = fits.map(_._5.aic).min
      val best = fits.filter(_._5.aic == bestAic)
        .minBy { case (p, q, sp, sq, _) => (p + q + sp + sq, p, q, sp, sq) }
      def r6(v: Double) = math.rint(v * 1e6) / 1e6
      fits.map { case (p, q, sp, sq, f) =>
        (p, q, sp, sq, f.order.nParams, r6(f.logLik), r6(f.aic),
          (p, q, sp, sq) == ((best._1, best._2, best._3, best._4)))
      }.toDF("p", "q", "sp", "sq", "n_params", "loglik", "aic", "is_best")
        .orderBy("aic", "p", "q", "sp", "sq")
    }),

    /** `ml_acf`: the sample AUTOCORRELATION function of the daily click
      * series — the order-selection diagnostic the reference's SARIMAX
      * workflow reads before fixing (p, q) (statsmodels `plot_acf`;
      * fitted orders in `Marilyn_Cleaning.ipynb:34 (cell 1)`), computed
      * DISTRIBUTED: r(k) = Σ(x_t−μ)(x_{t+k}−μ)/Σ(x_t−μ)² from one lead
      * window pass + one aggregation (the standard biased estimator —
      * full-series denominator). The global mean rides the broadcast
      * 1-row pattern; the unpartitioned lead window rides bounded
      * calendar-day rows per the repo convention. r10: the whole moment
      * pipeline moved onto the grid discipline (grid-6 daily means and
      * mean-of-means, DECIMAL-exact centered products) so the numerator/
      * denominator sums are order-free — the same pipeline now also
      * feeds `ml_pacf`'s Durbin–Levinson recursion, whose oracle needs
      * run- and engine-deterministic ACF inputs. Oracle replays windows
      * and DECIMAL sums exactly. */
    "ml_acf" -> ((s, d) => {
      val maxLag = 10
      acfMoments(s, d, maxLag)
        .select(posexplode(array((1 to maxLag).map(k =>
          round(round(col(s"num$k").cast("double") / col("den").cast("double"),
            9), 6) + lit(0.0)): _*)).as(Seq("idx", "acf")))
        .select((col("idx") + 1).cast("int").as("lag"), col("acf"))
        .orderBy("lag")
    }),

    /** `ml_pacf`: the PARTIAL autocorrelation companion (statsmodels
      * `plot_pacf(method="ywm")`) — Durbin–Levinson on the ACF prefix.
      * r10 flip to a FULL ORACLE row (VERDICT r9 ask #5): the ACF
      * moments come from the same distributed DECIMAL-exact aggregation
      * as `ml_acf` (den + num₁..num₁₀ — the shuffle carries 11 scalars,
      * never rows), the r(k) are fixed on the 1e-9 grid, and the
      * O(maxLag²) recursion runs on the driver over that aggregate-sized
      * state with EVERY step re-rounded to the 1e-9 grid HALF_UP — the
      * `ts_kalman_level`/`seq_markov_stationary` recursive-grid
      * discipline. The DuckDB twin replays the recursion as a recursive
      * CTE carrying the φ vector as a LIST, with the inner Σφⱼr_{k−j}
      * as an index-ORDERED list_reduce fold mirroring the driver's
      * left-to-right summation exactly (no engine aggregation order can
      * touch it). SarimaxSpec pins Durbin–Levinson against direct
      * Toeplitz Yule–Walker solves plus the AR(1) lag-1 cutoff;
      * `ml/Acf.scala` stays as the spec's plain in-memory reference. */
    "ml_pacf" -> ((s, d) => {
      import s.implicits._
      val maxLag = 10
      val row = acfMoments(s, d, maxLag).head()
      val den = row.getAs[java.math.BigDecimal](0).doubleValue
      val r = 0.0 +: (1 to maxLag).map(k =>
        Grid.r9(row.getAs[java.math.BigDecimal](k).doubleValue / den)).toArray
      r(0) = 1.0
      // Durbin–Levinson, every state on the 1e-9 grid; op order mirrors
      // the oracle CTE exactly (ordered fold, subtract, divide, round)
      val phi = new Array[Double](maxLag + 1) // 1-indexed current row
      val pacf = new Array[Double](maxLag + 1)
      phi(1) = r(1)
      pacf(1) = r(1)
      var v = Grid.r9(1.0 - r(1) * r(1))
      for (k <- 1 until maxLag) {
        val ssum = (1 to k).map(j => phi(j) * r(k + 1 - j)).reduceLeft(_ + _)
        val pk = Grid.r9((r(k + 1) - ssum) / v)
        val next = (1 to k).map(j => Grid.r9(phi(j) - pk * phi(k + 1 - j)))
        for (j <- 1 to k) phi(j) = next(j - 1)
        phi(k + 1) = pk
        pacf(k + 1) = pk
        v = Grid.r9(v * (1.0 - pk * pk))
      }
      (1 to maxLag).map(k => (k, Grid.r6z(r(k)), Grid.r6z(pacf(k))))
        .toDF("lag", "acf", "pacf").orderBy("lag")
    }),

    /** `ml_granger`: GRANGER-CAUSALITY screen between the click and
      * purchase 30-minute price series (does one series' past improve
      * the other's one-step forecast? — the lead/lag question a
      * multi-commodity desk asks before building cross-series features).
      * Lag-1 bivariate form, both directions: restricted y_t ~ (1, y_{t−1})
      * vs unrestricted y_t ~ (1, y_{t−1}, x_{t−1});
      * F = (SSR_r − SSR_u)/(SSR_u/(n−3)). Each direction is ONE
      * aggregation of nine exact moment sums over the bucket-joined
      * series (prices pre-rounded to the 1e-6 grid); the closed-form
      * 2×2 centered-Gram solve is scalar driver math the DuckDB twin
      * replays operand-for-operand, the same Cramer convention as
      * `ml_trend_per_series`. Rejection at the asymptotic χ²(1) 95 %
      * threshold, decided on the rounded statistic. */
    "ml_granger" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("bucket")
      val ser = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("bucket", expr("ts_ns div 1800000000000L"))
        .groupBy("bucket")
        .agg(Grid.mean6(when(col("event_type") === "click", col("value"))).as("a"),
          Grid.mean6(when(col("event_type") === "purchase", col("value"))).as("b"))
        .filter(col("a").isNotNull && col("b").isNotNull)
        .select(col("bucket"), col("a"), col("b"),
          lag(col("a"), 1).over(w).as("a1"), lag(col("b"), 1).over(w).as("b1"))
        .filter(col("a1").isNotNull && col("b1").isNotNull)
      // ONE aggregation carries every moment both directions need — the
      // series is scanned once, 14 sums travel (map-side combined)
      val r = ser.agg(count(lit(1)).as("n"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("a1")).as("sa1"), sum(col("b1")).as("sb1"),
        sum(col("a") * col("a")).as("saa"), sum(col("b") * col("b")).as("sbb"),
        sum(col("a1") * col("a1")).as("sa1a1"),
        sum(col("b1") * col("b1")).as("sb1b1"),
        sum(col("a1") * col("b1")).as("sa1b1"),
        sum(col("a") * col("a1")).as("saa1"), sum(col("a") * col("b1")).as("sab1"),
        sum(col("b") * col("b1")).as("sbb1"), sum(col("b") * col("a1")).as("sba1"))
        .head()
      val n = r.getAs[Long]("n")
      def g(c: String) = r.getAs[Double](c)
      // closed-form F from centered second moments (exact-sum assembly,
      // replayed operand-for-operand by the twin)
      def fStat(sy: Double, syy: Double, s1: Double, s11: Double, s2: Double,
                s22: Double, s12: Double, sy1: Double, sy2: Double): (Double, Double) = {
        val cyy = syy - sy * sy / n
        val c11 = s11 - s1 * s1 / n
        val c22 = s22 - s2 * s2 / n
        val c12 = s12 - s1 * s2 / n
        val cy1 = sy1 - sy * s1 / n
        val cy2 = sy2 - sy * s2 / n
        val ssrR = cyy - cy1 * cy1 / c11
        val det = c11 * c22 - c12 * c12
        val b1 = (cy1 * c22 - cy2 * c12) / det
        val b2 = (cy2 * c11 - cy1 * c12) / det
        val ssrU = cyy - b1 * cy1 - b2 * cy2
        (ssrU, (ssrR - ssrU) / (ssrU / (n - 3)))
      }
      def r6(v: Double) = math.rint(v * 1e6) / 1e6 + 0.0
      val dirs = Seq(
        ("purchase_to_click", fStat(g("sa"), g("saa"), g("sa1"), g("sa1a1"),
          g("sb1"), g("sb1b1"), g("sa1b1"), g("saa1"), g("sab1"))),
        ("click_to_purchase", fStat(g("sb"), g("sbb"), g("sb1"), g("sb1b1"),
          g("sa1"), g("sa1a1"), g("sa1b1"), g("sbb1"), g("sba1"))))
      dirs.map { case (name, (ssrU, f)) =>
        (name, n, r6(ssrU), r6(f), r6(f) > 3.841459)
      }.toDF("direction", "n", "ssr_unrestricted", "f_stat", "reject_95")
        .orderBy("direction")
    }),

    /** `ml_var_forecast`: VAR(1) — the MULTIVARIATE autoregression a
      * multi-commodity desk fits when series move together (Sims 1980;
      * the natural next step after `ml_granger` finds cross-effects).
      * Two equations over the same lag-1 design (click_t, purchase_t ~
      * 1, click_{t−1}, purchase_{t−1}), solved from the SAME 14-moment
      * single-aggregation frame as `ml_granger` by the centered-Gram
      * 2×2 closed form; intercepts recovered from the means; one-step
      * forecasts evaluated at the last observed pair (one tail lookup).
      * Long-form output, one row per equation, oracle-replayed
      * operand-for-operand. */
    "ml_var_forecast" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("bucket")
      val ser = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("bucket", expr("ts_ns div 1800000000000L"))
        .groupBy("bucket")
        .agg(Grid.mean6(when(col("event_type") === "click", col("value"))).as("a"),
          Grid.mean6(when(col("event_type") === "purchase", col("value"))).as("b"))
        .filter(col("a").isNotNull && col("b").isNotNull)
        .select(col("bucket"), col("a"), col("b"),
          lag(col("a"), 1).over(w).as("a1"), lag(col("b"), 1).over(w).as("b1"))
      val fit = ser.filter(col("a1").isNotNull && col("b1").isNotNull)
        .localCheckpoint()
      val r = fit.agg(count(lit(1)).as("n"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("a1")).as("sa1"), sum(col("b1")).as("sb1"),
        sum(col("a1") * col("a1")).as("sa1a1"),
        sum(col("b1") * col("b1")).as("sb1b1"),
        sum(col("a1") * col("b1")).as("sa1b1"),
        sum(col("a") * col("a1")).as("saa1"), sum(col("a") * col("b1")).as("sab1"),
        sum(col("b") * col("b1")).as("sbb1"), sum(col("b") * col("a1")).as("sba1"))
        .head()
      val n = r.getAs[Long]("n")
      def g(c: String) = r.getAs[Double](c)
      val c11 = g("sa1a1") - g("sa1") * g("sa1") / n
      val c22 = g("sb1b1") - g("sb1") * g("sb1") / n
      val c12 = g("sa1b1") - g("sa1") * g("sb1") / n
      val det = c11 * c22 - c12 * c12
      // per-equation solve: (coef on a1, coef on b1, intercept)
      def eq(sy: Double, sy1: Double, sy2: Double): (Double, Double, Double) = {
        val cy1 = sy1 - sy * g("sa1") / n
        val cy2 = sy2 - sy * g("sb1") / n
        val b1 = (cy1 * c22 - cy2 * c12) / det
        val b2 = (cy2 * c11 - cy1 * c12) / det
        (b1, b2, sy / n - b1 * g("sa1") / n - b2 * g("sb1") / n)
      }
      val (aa, ab, ca) = eq(g("sa"), g("saa1"), g("sab1"))
      val (ba, bb, cb) = eq(g("sb"), g("sbb1"), g("sba1"))
      val last = fit.orderBy(col("bucket").desc).limit(1)
        .select("a", "b").head()
      val (la, lb) = (last.getDouble(0), last.getDouble(1))
      def r6(v: Double) = math.rint(v * 1e6) / 1e6 + 0.0
      Seq(
        ("click", n, r6(ca), r6(aa), r6(ab), r6(ca + aa * la + ab * lb)),
        ("purchase", n, r6(cb), r6(ba), r6(bb), r6(cb + ba * la + bb * lb)))
        .toDF("equation", "n", "intercept", "coef_click_lag",
          "coef_purchase_lag", "forecast_next").orderBy("equation")
    }),

    /** `ml_theilsen`: THEIL–SEN robust trend of the daily click series —
      * the median of all pairwise slopes (x_j−x_i)/(t_j−t_i), the
      * breakdown-point-29 % alternative to OLS that one outlier day
      * cannot drag (Sen 1968). The day-grain series is CALENDAR-bounded
      * (the same driver-sized frame every `withFrame` fit collects), so
      * the O(n²) pair enumeration is exact driver math on metadata-sized
      * input — at 100 TB the distributed stage is the daily collapse,
      * not the pair scan. Slopes and the final median live on the 1e-6
      * grid; the intercept is the median residual at the fitted slope
      * (the standard Theil–Sen intercept). The DuckDB twin replays the
      * full pairwise join + median. */
    "ml_theilsen" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.events(s, d).filter(col("event_type") === "click")
        .groupBy(Tables.epochDay(col("ts")).cast("long").as("t"))
        .agg(Grid.mean6(col("value")).as("x"))
        .orderBy("t").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val slopes = (for {
        i <- daily.indices; j <- (i + 1) until daily.length
      } yield math.rint((daily(j)._2 - daily(i)._2) / (daily(j)._1 - daily(i)._1) * 1e6) / 1e6)
        .sorted
      def median(v: Seq[Double]): Double =
        if (v.length % 2 == 1) v(v.length / 2)
        else (v(v.length / 2 - 1) + v(v.length / 2)) / 2
      def r6(v: Double) = math.rint(v * 1e6) / 1e6 + 0.0
      val m = r6(median(slopes))
      val intercept = r6(median(daily.map { case (t, x) =>
        math.rint((x - m * t) * 1e6) / 1e6 }.sorted.toSeq))
      Seq((daily.length.toLong, slopes.length.toLong, m, intercept))
        .toDF("n_days", "n_pairs", "slope", "intercept")
    }),

    /** `ml_garch`: GARCH(1,1) VOLATILITY MLE on the 30-minute click
      * log-returns (`ml/Garch.scala`) — the conditional-heteroskedasticity
      * companion to the SARIMAX mean model (volatility clustering is the
      * defining stylized fact of commodity returns the reference's
      * homoskedastic residual assumption ignores). Distributed stage:
      * the bucket collapse + log-return window; the recursion σ²_t =
      * ω + α·r²_{t−1} + β·σ²_{t−1} is inherently sequential and fits on
      * the aggregate-sized driver series (the Kalman-SARIMAX posture).
      * FULL ORACLE (r16): the Nelder–Mead runs GRIDDED
      * (`Garch.fitGridded` — every vertex coordinate re-gridded 1e-9,
      * every objective value 1e-6 before ANY comparison, the vertex
      * sort explicitly stable on (value, index), infeasibility as the
      * grid-safe 1e18 sentinel), so the simplex path is a sequence of
      * DISCRETE states the DuckDB twin replays exactly — a
      * simplex-carrying recursive CTE whose per-candidate likelihood
      * is an index-ordered `list_reduce` fold of the σ² recursion
      * ([[garchSql]]). Log-returns are re-gridded 1e-9 at the source
      * (the one per-point libm seam); every later decision rides
      * gridded values, and the residual cross-engine exp/ln
      * divergence (~1e-13 on the 1437-term likelihood) is absorbed by
      * the 1e-6 objective grid. Output includes the persistence α+β
      * and the long-run variance ω/(1−α−β); GarchSpec pins
      * planted-parameter recovery on BOTH fit paths. */
    "ml_garch" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("bucket")
      val rets = Tables.events(s, d).filter(col("event_type") === "click")
        .withColumn("bucket", expr("ts_ns div 1800000000000L"))
        .groupBy("bucket").agg(Grid.mean6(col("value")).as("px"))
        .withColumn("lr", round(log(col("px") / lag(col("px"), 1).over(w)), 9))
        .filter(col("lr").isNotNull)
        .orderBy("bucket").select("lr")
        .collect().map(_.getDouble(0))
      val mu = rets.sum / rets.length
      val r = rets.map(_ - mu)
      val f = Garch.fitGridded(r)
      // house HALF_UP output rounding (== the twin's round(x, 6) + 0.0)
      def r6(v: Double) = Grid.r6z(v)
      Seq((f.n.toLong, r6(f.omega * 1e6), r6(f.alpha), r6(f.beta),
          r6(f.persistence), r6(f.uncondVar * 1e6), r6(f.logLik), r6(f.aic)))
        .toDF("n", "omega_x1e6", "alpha", "beta", "persistence",
          "uncond_var_x1e6", "loglik", "aic")
    }),

    /** `ml_hmm_regimes`: 2-state Gaussian HIDDEN MARKOV regime detection
      * on the 30-minute click log-returns (`ml/Hmm.scala` — Hamilton
      * 1989's Markov-switching lens on commodity series: calm vs
      * turbulent regimes that a single-distribution model averages
      * away). Baum–Welch EM with scaled forward–backward from a
      * deterministic moment-spread start, Viterbi MAP decode; states
      * relabeled by ascending mean so the report is stable. Driver-side
      * recursion over the aggregate-sized series (the SARIMAX/GARCH
      * posture). Rows-only: EM + dynamic programming have no SQL form;
      * HmmSpec pins planted-regime recovery, the EM likelihood-ascent
      * law, and Viterbi against brute-force path enumeration. */
    "ml_hmm_regimes" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("bucket")
      val rets = Tables.events(s, d).filter(col("event_type") === "click")
        .withColumn("bucket", expr("ts_ns div 1800000000000L"))
        .groupBy("bucket").agg(Grid.mean6(col("value")).as("px"))
        .withColumn("lr", log(col("px") / lag(col("px"), 1).over(w)))
        .filter(col("lr").isNotNull)
        .orderBy("bucket").select("lr")
        .collect().map(_.getDouble(0))
      val f = Hmm.fit(rets, k = 2)
      val path = Hmm.viterbi(rets, f)
      // stable labels: state 0 = lower mean
      val order = f.means.zipWithIndex.sortBy(_._1).map(_._2)
      def r6(v: Double) = math.rint(v * 1e6) / 1e6 + 0.0
      val rows = order.zipWithIndex.map { case (orig, lab) =>
        val n = path.count(_ == orig).toLong
        // mean run length of this state's visits along the MAP path
        var runs = 0L; var prev = -1
        path.foreach { st =>
          if (st == orig && prev != orig) runs += 1
          prev = st
        }
        (lab, r6(f.pi(orig)), r6(f.means(orig) * 1e3), r6(f.vars(orig) * 1e3),
          r6(f.trans(orig)(orig)), n,
          if (runs > 0) r6(n.toDouble / runs) else 0.0)
      }.toSeq
      rows.toDF("state", "pi", "mean_x1e3", "var_x1e3", "stay_prob",
          "n_assigned", "avg_run_len")
        .withColumn("loglik", lit(r6(f.logLik)))
        .orderBy("state")
    }),

    /** Per-series quadratic trend via the [[GroupedOls]] custom
      * Aggregator: value ~ (1, day, day²) fitted for every event_type in
      * ONE aggregation — the shuffle carries O(k²) sufficient statistics
      * per group, not rows, where `regr_*` (single regressor) and
      * per-key MLlib fits both fall short. Oracle-checked even though
      * DuckDB has no multi-feature OLS: the twin accumulates the same
      * eight Gram/moment sums and solves the 3×3 normal equations by
      * Cramer's rule. That hinges on conditioning — the day ordinal is
      * anchored at the corpus min (one tiny agg, the usual two-phase
      * pattern) and rescaled so t ∈ [0, ~few]; with raw epoch days the
      * near-collinear t/t² Gram loses enough precision that elimination
      * (engine) and Cramer (oracle) would disagree past 1e-6. MlSpec
      * additionally pins the closed form. */
    "ml_trend_per_series" -> ((s, d) => {
      val groupedOls = udaf(new GroupedOls(3))
      val dayRaw = Tables.epochDay(col("ts"))
      val minDay = Tables.events(s, d).agg(min(dayRaw)).head().getInt(0)
      val day = (dayRaw - lit(minDay)).cast("double") / 100.0
      Tables.events(s, d)
        .select(col("event_type"),
          array(lit(1.0), day, day * day).as("x"),
          col("value").cast("double").as("y"))
        .groupBy("event_type")
        .agg(groupedOls(col("x"), col("y")).as("w"))
        .select(col("event_type"),
          round(element_at(col("w"), 1), 6).as("b0"),
          round(element_at(col("w"), 2), 6).as("b1"),
          round(element_at(col("w"), 3), 6).as("b2"))
        .orderBy("event_type")
    }),

    /** Augmented Dickey-Fuller (maxlag=2, constant case) fully in-engine
      * via [[GroupedOlsStats]]: Δx_t ~ (1, x_{t-1}, Δx_{t-1}, Δx_{t-2})
      * per series, reporting the level coefficient's t-stat — the actual
      * ADF statistic. One window pass builds the design, ONE aggregation
      * fits every series (O(k²) stats per group); the existing
      * `stationarity_test` stays as the maxlag=0 `regr_*` twin, and
      * MlSpec proves both implementations agree in that limit. */
    "stationarity_test_adf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .withColumn("day", Tables.epochDay(col("ts")))
        .groupBy("event_type", "day").agg(avg("value").as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val lagged = daily
        .withColumn("x1", lag("x", 1).over(w))
        .withColumn("dx", col("x") - col("x1"))
        .withColumn("dx1", lag(col("dx"), 1).over(w))
        .withColumn("dx2", lag(col("dx"), 2).over(w))
        .na.drop("any", Seq("x1", "dx", "dx1", "dx2"))
      val stats = udaf(new GroupedOlsStats(4))
      lagged.select(col("event_type"),
          array(lit(1.0), col("x1"), col("dx1"), col("dx2")).as("xv"),
          col("dx").as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), stats(col("xv"), col("y")).as("w"))
        .select(col("event_type"), col("n"),
          round(element_at(col("w"), 2), 6).as("beta_level"),
          round(element_at(col("w"), 6), 4).as("adf_tstat"))
        .orderBy("event_type")
    }),

    "ml_walk_forward" -> ((s, d) => {
      import s.implicits._
      withFrame(s, d) { df =>
        val cuts = Evaluation.timeCuts(df, "date_id", 3)
        val folds = Evaluation.walkForwardSplits(df, "date_id", cuts)
          .zipWithIndex.filter { case ((tr, te), _) => !tr.isEmpty && !te.isEmpty }
        // folds are independent fit+score tasks — parallel driver threads
        val rows = Models.inParallel(folds.map { case ((train, test), i) => () =>
          val m = Models.ols(ModelingFrame.Target).fit(train)
          val pred = m.transform(test).select(
            col(ModelingFrame.Target).as("y"), col(Models.PredictionCol).as("yhat"))
          val r = Evaluation.metricsFull(pred, "y", "yhat").head()
          (i, r.getAs[Long]("n"),
            math.rint(r.getAs[Double]("rmse") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("mae") * 1e6) / 1e6)
        })
        rows.toDF("fold", "n_test", "rmse", "mae").orderBy("fold")
      }
    }),

    /** `ml_conformal_interval`: SPLIT-CONFORMAL prediction intervals —
      * the distribution-free upgrade a forecasting product needs over a
      * point forecast (the reference reports point metrics only).
      * Protocol (Vovk; Lei et al. 2018): time-ordered 50/25/25 split
      * (train < c₁ ≤ cal < c₂ ≤ test from integer µs-clock cuts), OLS on
      * train, nonconformity = |y − ŷ| on cal, q̂ = the
      * ⌈(n_cal+1)(1−α)⌉-th smallest cal score (α=0.1 — integer ceil
      * arithmetic, no float), and the interval ŷ ± q̂ is guaranteed
      * ≥ 1−α coverage on exchangeable data; the query reports the
      * EMPIRICAL test coverage next to the guarantee.
      *
      * The regression runs ROW-LEVEL on the fact table (value ~ type
      * dummies + hour-of-day), not on the aggregate-sized daily frame —
      * calibration needs enough points for a meaningful quantile, and
      * this is the shape conformal takes at 100 TB: the fit is a k-sized
      * normal-equations solve, the calibration quantile is an EXACT
      * order statistic taken as max-of-k-smallest (orderBy + limit k →
      * TakeOrdered, never a materialized global sort), and n_cal is the
      * only driver round-trip. Coverage compares residuals pre-rounded
      * to the 1e-6 grid so both engines decide every boundary
      * identically. Oracle replays the whole protocol: elimination
      * closed-form OLS over the same five regressors, row_number order
      * statistic, same integer cuts and ceil. */
    "ml_conformal_interval" -> ((s, d) => {
      import s.implicits._
      val feats = Seq("f_error", "f_purchase", "f_signup", "f_view", "f_hour")
      val base = Tables.events(s, d).select(
        col("event_id"),
        expr("unix_micros(ts)").as("ts_us"),
        (col("event_type") === "error").cast("double").as("f_error"),
        (col("event_type") === "purchase").cast("double").as("f_purchase"),
        (col("event_type") === "signup").cast("double").as("f_signup"),
        (col("event_type") === "view").cast("double").as("f_view"),
        hour(col("ts")).cast("double").as("f_hour"),
        col("value").as("y"))
      val b = base.agg(min(col("ts_us")), max(col("ts_us"))).head()
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val (c1, c2) = (lo + (hi - lo) / 2, lo + (hi - lo) * 3 / 4)
      val assembled = Models.assemble(base, feats)
      val train = assembled.filter(col("ts_us") < c1)
      val cal = assembled.filter(col("ts_us") >= c1 && col("ts_us") < c2)
      val test = assembled.filter(col("ts_us") >= c2)
      val m = Models.ols("y").fit(train)
      def resid(x: DataFrame) = m.transform(x).select(col("event_id"),
        abs(col("y") - col(Models.PredictionCol)).as("r"))
      val calR = resid(cal).cache()
      try {
        val nCal = calR.count()
        val k = (9L * (nCal + 1) + 9L) / 10L // ceil(0.9·(n_cal+1)), exact
        require(k >= 1 && k <= nCal, s"calibration window too small: n_cal=$nCal")
        // limit() takes an Int, so the TakeOrdered order-statistic path
        // holds to k ≤ 2^31−1 (≈2.38 B calibration rows at α=0.1); past
        // that the silent k.toInt wrap would corrupt the quantile, so
        // refuse loudly — the >2B-row regime needs a bucketed two-pass
        // order statistic, not a wider limit.
        require(k <= Int.MaxValue, s"calibration rank k=$k exceeds limit() range")
        val q = calR.orderBy(col("r"), col("event_id")).limit(k.toInt)
          .agg(max(col("r"))).head().getDouble(0)
        val cov = resid(test)
          .agg(count(lit(1)).as("n"),
            avg((round(col("r"), 6) <= round(lit(q), 6)).cast("double")).as("c"))
          .head()
        def r6(v: Double) = math.rint(v * 1e6) / 1e6
        Seq((train.count(), nCal, cov.getAs[Long]("n"), k,
            r6(q), r6(cov.getAs[Double]("c")), r6(2 * q)))
          .toDF("n_train", "n_cal", "n_test", "k", "q_hat", "coverage", "avg_width")
      } finally { calR.unpersist(); () }
    }),

    /** `ml_svr` (de-excluded): linear ε-insensitive SVR — sklearn
      * `LinearSVR`-shaped (C=1, ε=0); kernel SVR stays excluded (O(n²)
      * kernel matrix has no 100 TB analog — see `ml/Svr.scala`). */
    "ml_svr" -> ((s, d) => {
      import s.implicits._
      withFineFrame(s, d) { train =>
        // smoothing scaled to the label (δ = 1% of σy): a fixed tiny δ
        // makes the hinge curvature 1/δ enormous relative to the data
        // scale and L-BFGS runs to maxIter; the optimum moves O(δ)
        val (_, sy) = Models.labelStats(train, ModelingFrame.Target)
        val m = Svr.fit(train, ModelingFrame.EventTypes, ModelingFrame.Target,
          smoothing = math.max(1e-3, 0.01 * sy), maxIter = 100)
        round6((ModelingFrame.EventTypes.zip(m.coefficients) :+
            (("__intercept", m.intercept))).toDF("feature", "coefficient"),
          Seq("coefficient")).orderBy("feature")
      }
    }),

    /** `ml_svr_rbf`: kernel SVR de-excluded — RBF via the seeded
      * random-Fourier-features map (`ml/Svr.scala` `fitRbf`, Rahimi &
      * Recht 2007), linear in n, never forming the O(n²) Gram matrix.
      * The reference's `SVR()` default is the RBF kernel
      * (`Marilyn_Cleaning.ipynb` cell 1 / `slide15.xml`), so this — not
      * `ml_svr` — is the named model family's runnable counterpart.
      * γ = 1/k mirrors sklearn's `gamma='scale'` on z-scored inputs.
      * Output mirrors `ml_gbt`'s train-metrics row; rows-only (the RFF
      * weights live in a rotated feature space with no SQL closed form —
      * kernel recovery is pinned in `MlSpec`). */
    "ml_svr_rbf" -> ((s, d) => {
      import s.implicits._
      withFineFrame(s, d) { train =>
        val (_, sy) = Models.labelStats(train, ModelingFrame.Target)
        // tolerance 1e-4: sklearn SVR stops at tol=1e-3 — every extra
        // L-BFGS evaluation is one scheduled job on the tiny cached
        // frame, so a tighter stop buys 6th-decimal metric shifts (the
        // output is rows-only) at real wall-clock cost
        val m = Svr.fitRbf(train, ModelingFrame.EventTypes, ModelingFrame.Target,
          gamma = 1.0 / ModelingFrame.EventTypes.size, numFeatures = 64,
          smoothing = math.max(1e-3, 0.01 * sy), maxIter = 100, tolerance = 1e-4)
        val pred = train.select(
          col(ModelingFrame.Target).as("y"),
          m.predictExpr(ModelingFrame.EventTypes).as("yhat"))
        val r = Evaluation.metricsFull(pred, "y", "yhat").head()
        Seq((r.getAs[Long]("n"),
            math.rint(r.getAs[Double]("mae") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("rmse") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("r2") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("dir_acc") * 1e6) / 1e6))
          .toDF("n", "mae", "rmse", "r2", "dir_acc")
      }
    }),

    /** `ml_mlp` (de-excluded): 1-hidden-layer ReLU MLP regressor,
      * full-batch L-BFGS (sklearn `MLPRegressor(solver="lbfgs")` shape),
      * internally z-scaled — the reference's MLP "collapsed"
      * (`slide24.xml`), which unscaled inputs reproduce. Output mirrors
      * `ml_gbt`'s train-metrics row. */
    "ml_mlp" -> ((s, d) => {
      import s.implicits._
      withFineFrame(s, d) { train =>
        // tolerance 1e-4 = sklearn MLPRegressor's own tol (see ml_svr_rbf)
        val m = Mlp.fit(train, ModelingFrame.EventTypes, ModelingFrame.Target,
          h = 16, maxIter = 150, tolerance = 1e-4)
        val pred = train.select(
          col(ModelingFrame.Target).as("y"),
          m.predictExpr(ModelingFrame.EventTypes).as("yhat"))
        val r = Evaluation.metricsFull(pred, "y", "yhat").head()
        Seq((r.getAs[Long]("n"),
            math.rint(r.getAs[Double]("mae") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("rmse") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("r2") * 1e6) / 1e6,
            math.rint(r.getAs[Double]("dir_acc") * 1e6) / 1e6))
          .toDF("n", "mae", "rmse", "r2", "dir_acc")
      }
    }),

    /** `ml_isotonic`: ISOTONIC regression (monotone least-squares — the
      * calibration primitive: probability/score calibration, monotone
      * dose-response, shape-constrained trend). Fit: next-bucket click
      * target as a monotone function of the current click mean over the
      * 30-minute modeling frame. FULL ORACLE (r15): the PAVA solution is
      * computed through its MINIMAX characterization
      * ŷᵢ = max_{j≤i} min_{l≥i} Avg(j..l) — the `ml_isotonic_calibration`
      * conversion's form, here at the O(k²) pair frame (k = distinct
      * grid-6 click values, calendar-bounded ≤ ~1.4k at any SF, so the
      * ~1M-row pair join is aggregate-scale): exact BIGINT/DECIMAL
      * prefix sums, one double division per block average, a suffix-min
      * window per left start, a max per point — both engines replay
      * every double bit for bit. Metrics fold as exact-decimal sums of
      * 1e-9-gridded residual terms. MlSpec keeps the exact-PAVA fixture
      * law (the minimax form IS PAVA's optimum) and the monotone
      * postcondition. */
    "ml_isotonic" -> ((s, d) => {
      import s.implicits._
      val base = ModelingFrame.buildFine(s, d)
        .select(col("click").as("x"), col(ModelingFrame.Target).as("y"))
        .localCheckpoint(eager = true) // pts + the scoring join
      // per-distinct-x sufficient statistics: k ≤ ~1.4k at any SF
      // (calendar-bounded), so the fit itself is aggregate-sized driver
      // work (the `ml_pacf` bound) — the O(k²) minimax loop below runs
      // in milliseconds where the equivalent pair-join plan paid ~2 s of
      // shuffle/window scheduling for the same bit-identical doubles
      val pts = base.groupBy("x").agg(count(lit(1)).as("w"),
          sum(col("y").cast("decimal(18,6)")).as("sy"))
        .orderBy("x").collect()
      val k = pts.length
      val xs = pts.map(_.getAs[Double]("x"))
      val cw = pts.map(_.getAs[Long]("w")).scanLeft(0L)(_ + _).tail
      val cs = pts.map(_.getAs[java.math.BigDecimal]("sy"))
        .scanLeft(java.math.BigDecimal.ZERO)(_ add _).tail
      // block average over [j, l]: one double division of exact
      // prefix-sum differences — the EXACT arithmetic of the oracle's
      // pair CTE (CAST(l.cs − (j.cs − j.sy) AS DOUBLE) / …)
      def avg(j: Int, l: Int): Double = {
        val sd = if (j == 0) cs(l) else cs(l).subtract(cs(j - 1))
        val wd = if (j == 0) cw(l) else cw(l) - cw(j - 1)
        sd.doubleValue / wd
      }
      // minimax ŷᵢ = max_{j≤i} min_{l≥i} avg(j..l): per left start j,
      // one suffix-min sweep — min/max over the same doubles the oracle
      // window computes, so the fit is bit-identical
      val yhat = Array.fill(k)(Double.NegativeInfinity)
      var j = 0
      while (j < k) {
        var mn = Double.PositiveInfinity
        var l = k - 1
        while (l >= j) {
          val a = avg(j, l)
          if (a < mn) mn = a
          if (mn > yhat(l)) yhat(l) = mn
          l -= 1
        }
        j += 1
      }
      val nBlocks = 1L + (1 until k).count(i => yhat(i) != yhat(i - 1))
      val fit = xs.zip(yhat).toSeq.toDF("x", "yhat")
      val e = col("y") - col("yhat")
      val r = base.join(broadcast(fit), "x").agg(
        count(lit(1)).as("n"),
        sum(col("y").cast("decimal(18,6)")).as("sy"),
        sum((col("y").cast("decimal(18,6)") * col("y").cast("decimal(18,6)"))
          .cast("decimal(30,12)")).as("syy"),
        sum(round(abs(e), 9).cast("decimal(18,9)")).as("sae"),
        sum(round(e * e, 9).cast("decimal(18,9)")).as("sse")).head()
      val n = r.getAs[Long]("n").toDouble
      val sy = r.getAs[java.math.BigDecimal]("sy").doubleValue
      val syy = r.getAs[java.math.BigDecimal]("syy").doubleValue
      val sae = r.getAs[java.math.BigDecimal]("sae").doubleValue
      val sse = r.getAs[java.math.BigDecimal]("sse").doubleValue
      def r6(v: Double) =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((r.getAs[Long]("n"), nBlocks, r6(sae / n), r6(math.sqrt(sse / n)),
          r6(1.0 - sse / (syy - sy * sy / n)) + 0.0))
        .toDF("n", "n_blocks", "mae", "rmse", "r2")
    }),

    /** `ml_shap` (de-excluded): exact closed-form linear SHAP over the
      * OLS fit — φⱼ = wⱼ(xⱼ−μⱼ); additivity pinned in MlSpec, and the
      * whole summary oracle-checked against the elimination closed form
      * (see shapSql). `+ 0.0` canonicalizes mean_shap's −0.0 (the value
      * is identically zero over the background frame; only 1e-17 noise
      * decides the rounded zero's sign). */
    "ml_shap" -> ((s, d) => {
      withFrame(s, d) { train =>
        val m = Models.ols(ModelingFrame.Target).fit(train)
        val (coefs, intercept) = Models.coefficients(m, ModelingFrame.EventTypes)
        round6(Explain.linearShapSummary(train, coefs, intercept),
          Seq("mean_abs_shap", "mean_shap", "coefficient", "base_value"))
          .withColumn("mean_shap", col("mean_shap") + lit(0.0))
          .orderBy("feature")
      }
    }),

    /** `ml_holt_winters`: additive triple exponential smoothing on the
      * 30-minute click series (season = the 48-bucket daily cycle) — the
      * classical seasonal baseline the statsmodels family ships next to
      * SARIMAX. Coarse 48-point (α, β, γ) grid by one-step-ahead SSE,
      * deterministic (sse, α, β, γ) tiebreak; the series collapse is the
      * distributed stage, the recursions run on the driver like every
      * serial filter. FULL ORACLE (r15, VERDICT ask #2): each grid pass
      * is the `ml_holt_winters_filter` grid-rounded recursion
      * generalized to (α, β, γ) (`HwFilter.runParam`), and the DuckDB
      * twin (R10 `hwGridSql`) rides the SAME 48 points through ONE
      * recursive CTE with the grid as an extra dimension — the 48-replay
      * conversion the r14 verdict sketched. SarimaxSpec still pins
      * planted-series recovery of the unrounded `HoltWinters` library
      * path. */
    "ml_holt_winters" -> ((s, d) => {
      import s.implicits._
      import graft.operators.HwFilter
      val season = HwFilter.M
      val y = Tables.events(s, d).filter(col("event_type") === "click")
        .withColumn("bucket", expr("ts_ns div 1800000000000L"))
        .groupBy("bucket").agg(Grid.mean6(col("value")).as("yv"))
        .orderBy("bucket")
        .select("yv").as[Double].collect()
      val grid = for {
        a <- Seq(0.1, 0.3, 0.5, 0.8)
        b <- Seq(0.01, 0.1, 0.3)
        g <- Seq(0.05, 0.1, 0.3, 0.5)
      } yield (a, b, g)
      val fits = grid.map { case (a, b, g) =>
        (a, b, g, HwFilter.runParam(y, a, b, g))
      }
      val (a, b, g, st) = fits.minBy { case (aa, bb, gg, f) =>
        (f.sse, aa, bb, gg)
      }
      val (nObs, level, trend, f1, f48, rmse) = HwFilter.summary(st)
      Seq((a, b, g, season, nObs, rmse, level, trend, f1, f48))
        .toDF("alpha", "beta", "gamma", "season", "n_obs", "rmse",
          "level", "trend", "forecast_1", "forecast_1day")
    }),

    /** GAUSSIAN MIXTURE over the (click, purchase) plane — the SOFT
      * clustering completion of the family (`ml_kmeans` partitions,
      * `ml_hmm_regimes` adds time; GMM gives static density-based
      * posteriors): seeded MLlib EM, k=3, full covariances. Output per
      * component: weight, means, covariance diagonal, and the MAP
      * cluster size — the mixture summary an EDA reads. Rows-only (an
      * EM fixed point has no SQL form); MlSpec pins planted
      * two-Gaussian recovery and seeded determinism. */
    "ml_gmm_clusters" -> ((s, d) => {
      import s.implicits._
      val pts = ModelingFrame.buildFine(s, d)
        .select(col("bucket_id"), col("click"), col("purchase"))
      val train = Models.assemble(pts, Seq("click", "purchase"))
      val m = new org.apache.spark.ml.clustering.GaussianMixture()
        .setK(3).setMaxIter(60).setTol(1e-6).setSeed(42L)
        .setFeaturesCol(Models.FeaturesCol)
        .fit(train)
      val sizes = m.transform(train).groupBy("prediction")
        .agg(count(lit(1)).as("n_points"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      def r6(v: Double) = math.rint(v * 1e6) / 1e6 + 0.0
      (0 until 3).map { k =>
        val g = m.gaussians(k)
        (k.toLong, r6(m.weights(k)), r6(g.mean(0)), r6(g.mean(1)),
          r6(g.cov(0, 0)), r6(g.cov(1, 1)), sizes.getOrElse(k, 0L))
      }.toDF("component", "weight", "mean_click", "mean_purchase",
        "var_click", "var_purchase", "n_points")
        .orderBy("component")
    }),

    /** OLS INFLUENCE DIAGNOSTICS — leverage hᵢᵢ and Cook's distance
      * over the 30-minute frame: the regression-audit table (which rows
      * MOVE the fit?) every careful OLS workflow reads before trusting
      * coefficients. The K×K normal matrix accumulates in ONE exact
      * DECIMAL aggregation; its 6×6 inverse is driver-side metadata
      * (breeze — the linalg MLlib itself ships), and leverage/Cook
      * score the WHOLE frame as pure codegen'd quadratic-form COLUMNS
      * with the inverse inlined as literals (the
      * `corpus_quality_classifier` serving posture: model-sized driver
      * state, narrow scoring map, no shuffle). Top-10 by Cook's D with
      * the 4/n flag. FULL ORACLE (r14 — unblocked by the grid-6 fine
      * frame): shared-order Cholesky + forward-substitution leverage,
      * generated identically in [[influenceSql]]; MlSpec additionally
      * pins hat-matrix laws (Σh = p, h ∈ (0,1]) and a driver-side
      * replay of the top row. */
    "ml_influence_diagnostics" -> ((s, d) => {
      val feats = ModelingFrame.EventTypes
      val df0 = ModelingFrame.buildFine(s, d)
        .select(col("bucket_id") +: col(ModelingFrame.Target).as("y") +: feats.map(col): _*)
      val xcols = lit(1.0) +: feats.map(col)
      val p = xcols.size
      val prodAggs =
        (for (i <- 0 until p; j <- i until p) yield
          sum((xcols(i) * xcols(j)).cast("decimal(38,10)")).as(s"xx_${i}_$j")) ++
        (0 until p).map(i => sum((xcols(i) * col("y")).cast("decimal(38,10)")).as(s"xy_$i")) :+
        sum((col("y") * col("y")).cast("decimal(38,10)")).as("yy") :+
        count(lit(1)).as("n")
      val r = df0.agg(prodAggs.head, prodAggs.tail: _*).head()
      val n = r.getAs[Long]("n")
      val xtx = Array.tabulate(p, p) { (i, j) =>
        val (a, b) = (math.min(i, j), math.max(i, j))
        r.getAs[java.math.BigDecimal](s"xx_${a}_$b").doubleValue()
      }
      val xty = Array.tabulate(p)(i =>
        r.getAs[java.math.BigDecimal](s"xy_$i").doubleValue())
      // FULL ORACLE (r14, unblocked by the grid-6 fine frame): the
      // LAPACK inverse is replaced by the shared-order no-pivot
      // Cholesky of the fin_min_variance_portfolio doctrine — XᵀX is
      // SPD, every fold below is left-associated ascending-index, and
      // influenceSql GENERATES the identical expression tree, so every
      // double is bit-identical across engines. Leverage comes from the
      // factor directly: h = ‖L⁻¹x‖² (no explicit inverse).
      val lm = Array.ofDim[Double](p, p)
      for (j <- 0 until p) {
        var dAcc = xtx(j)(j)
        for (m <- 0 until j) dAcc -= lm(j)(m) * lm(j)(m)
        lm(j)(j) = math.sqrt(dAcc)
        for (i <- j + 1 until p) {
          var acc = xtx(i)(j)
          for (m <- 0 until j) acc -= lm(i)(m) * lm(j)(m)
          lm(i)(j) = acc / lm(j)(j)
        }
      }
      val zv = Array.ofDim[Double](p)
      for (i <- 0 until p) {
        var acc = xty(i)
        for (m <- 0 until i) acc -= lm(i)(m) * zv(m)
        zv(i) = acc / lm(i)(i)
      }
      val beta = Array.ofDim[Double](p)
      for (i <- p - 1 to 0 by -1) {
        var acc = zv(i)
        for (m <- i + 1 until p) acc -= lm(m)(i) * beta(m)
        beta(i) = acc / lm(i)(i)
      }
      val betaDotXty = {
        var acc = beta(0) * xty(0)
        for (i <- 1 until p) acc += beta(i) * xty(i)
        acc
      }
      val s2 = (r.getAs[java.math.BigDecimal]("yy").doubleValue() -
        betaDotXty) / (n - p)
      // forward substitution as nested codegen'd columns: v = L⁻¹x
      val v = Array.ofDim[Column](p)
      for (i <- 0 until p) {
        var e: Column = xcols(i)
        for (m <- 0 until i) e = e - lit(lm(i)(m)) * v(m)
        v(i) = e / lit(lm(i)(i))
      }
      val hatCol = v.map(c => c * c).reduce(_ + _)
      val predCol = (0 until p).map(i => lit(beta(i)) * xcols(i)).reduce(_ + _)
      df0
        .withColumn("h", hatCol)
        .withColumn("resid", col("y") - predCol)
        .withColumn("cook", (col("resid") * col("resid") * col("h")) /
          (lit(p.toDouble) * lit(s2) * (lit(1.0) - col("h")) * (lit(1.0) - col("h"))))
        // signed-zero guard (house r6z discipline): resid is signable, and
        // Spark/DuckDB can disagree on ±0.0 for a tiny-magnitude residual
        .select(col("bucket_id"), (round(col("resid"), 6) + lit(0.0)).as("resid"),
          round(col("h"), 6).as("leverage"), round(col("cook"), 6).as("cooks_d"),
          (round(col("cook"), 6) > Grid.r6(4.0 / n)).as("influential"))
        .orderBy(col("cooks_d").desc, col("bucket_id").asc).limit(10)
    }),

    /** ISOLATION FOREST (`operators/IsolationForest.scala`, Liu et al.
      * 2008) over the 30-minute multivariate frame — the unsupervised
      * multivariate anomaly detector next to the univariate Hampel/STL
      * flags: 100 seeded trees trained driver-side on the paper's own
      * ψ=256 bounded subsample (model-sized — THE property that makes
      * iForest scale-free), every bucket scored by a narrow
      * executor-side map walking the broadcast forest (no shuffle at
      * serving). Emits the top-10 most isolated buckets with scores
      * plus the frame-wide score moments. Rows-only: 100 random trees
      * have no SQL form; IsolationForestSpec pins planted-outlier
      * detection, the score range law, and seeded determinism. */
    "ml_isolation_forest" -> ((s, d) => {
      import s.implicits._
      val frame = ModelingFrame.buildFine(s, d)
      locally {
        val feats = ModelingFrame.EventTypes
        val rows = frame.select(col("bucket_id") +: feats.map(col): _*)
          .orderBy("bucket_id")
          .collect().map(r => (r.getLong(0),
            feats.indices.map(i => r.getDouble(i + 1)).toArray))
        val psi = math.min(256, rows.length)
        val forest = graft.operators.IsolationForest.fit(rows.map(_._2), 100, psi)
        val bc = s.sparkContext.broadcast(forest)
        val scored = rows.toSeq.toDF("bucket_id", "fv")
          .as[(Long, Seq[Double])]
          .map { case (id, fv) =>
            (id, math.rint(graft.operators.IsolationForest
              .score(fv.toArray, bc.value, psi) * 1e6) / 1e6)
          }
          .toDF("bucket_id", "score")
        val stats = scored.agg(Grid.mean6(col("score")).as("mean"),
          round(max("score"), 6).as("mx")).head()
        scored.orderBy(col("score").desc, col("bucket_id").asc).limit(10)
          .withColumn("mean_score", lit(stats.getDouble(0)))
          .withColumn("is_anomalous", col("score") > 0.6)
      }
    }),

    /** ALS COLLABORATIVE FILTERING — Spark's canonical distributed
      * recommender (MLlib `ALS`, Hu et al. 2008 implicit variant) on
      * the customer×part purchase matrix: implicit preference with
      * order-count confidence, rank 8, seeded (ALS's normal-equation
      * blocks are deterministic under a fixed seed and partitioning).
      * Each iteration alternates two block-solved least-squares sweeps
      * — the factor-matrix shuffle IS the scale story (factors stay
      * partitioned, ratings stream past them). Output: top-3 part
      * recommendations for the 10 most active customers (deterministic
      * audit slice) plus the training-set RMSE row. Rows-only: an
      * iterative matrix factorization has no SQL form; MlSpec pins
      * seeded determinism and that recommendations rank a user's OWN
      * purchased parts above never-purchased ones on average
      * (reconstruction sanity). */
    "ml_als_recommend" -> ((s, d) => {
      import s.implicits._
      val ratings = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").cast("int").as("user"),
          col("l_partkey").cast("int").as("item"))
        .agg(count(lit(1)).cast("float").as("cnt"))
      val als = new org.apache.spark.ml.recommendation.ALS()
        .setUserCol("user").setItemCol("item").setRatingCol("cnt")
        .setImplicitPrefs(true).setRank(8).setMaxIter(8)
        .setRegParam(0.1).setAlpha(1.0).setSeed(42L)
        .setColdStartStrategy("drop")
      val m = als.fit(ratings)
      val topUsers = ratings.groupBy("user").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user").asc).limit(10)
      val recs = m.recommendForUserSubset(topUsers, 3)
        .select(col("user"), posexplode(col("recommendations")))
        .select(col("user"), (col("pos") + 1).cast("long").as("rank"),
          col("col.item").as("item"),
          round(col("col.rating"), 4).as("score"))
      // reconstruction signal: mean predicted preference over the
      // OBSERVED (user, item) pairs — high iff the factorization
      // actually fits the interaction matrix (audit row, user = -1)
      val pred = m.transform(ratings)
        .agg(avg(col("prediction")).as("mean_pref"))
        .select(lit(-1).as("user"), lit(0L).as("rank"), lit(-1).as("item"),
          round(col("mean_pref"), 4).as("score"))
      recs.unionAll(pred).orderBy("user", "rank", "item")
    }),

    /** KAPLAN–MEIER survival curve over user lifetimes — the
      * censoring-aware retention estimator next to the naive
      * `retention_cohorts` (users still active at the span edge are
      * CENSORED, not churned; ignoring that biases retention down).
      * Lifetime = last−first active day per user; churn is observed
      * when the user has been quiet ≥ 7 days before the span end,
      * otherwise the lifetime is right-censored. The product-limit
      * estimator runs as pure ordered-window algebra: risk set via a
      * prior-rows cumulative count, S(t) = exp(Σ ln(1−d/n)) as a
      * sequential cumulative window (both engines accumulate in the
      * same t-order ⇒ identical IEEE doubles). Two keyed aggregations
      * + one |distinct-lifetimes|-sized window: fully SQL-replayable,
      * full oracle. */
    "ml_survival_km" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val life = Tables.events(s, d).groupBy("user_id")
        .agg(min(Tables.epochDay(col("ts")).cast("long")).as("first_day"),
          max(Tables.epochDay(col("ts")).cast("long")).as("last_day"))
      val bounds = life.agg(max("last_day").as("span_end"),
        count(lit(1)).as("n_users"))
      val obs = life.crossJoin(broadcast(bounds))
        .select(col("n_users"),
          (col("last_day") - col("first_day")).as("t"),
          (col("last_day") <= col("span_end") - 7).cast("long").as("e"))
      val byT = obs.groupBy("t")
        .agg(max("n_users").as("n_users"), count(lit(1)).as("n_at_t"),
          sum("e").as("d_events"),
          (count(lit(1)) - sum("e")).as("c_censored"))
      val w = Window.orderBy("t")
      byT
        .withColumn("prior", coalesce(
          sum(col("n_at_t")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n_risk", col("n_users") - col("prior"))
        .withColumn("lnterm", when(col("d_events") > 0,
          log(lit(1.0) - col("d_events") / col("n_risk"))).otherwise(lit(0.0)))
        .withColumn("survival", round(exp(
          sum(col("lnterm")).over(w.rowsBetween(Window.unboundedPreceding, 0))), 6))
        .select(col("t").as("lifetime_days"), col("n_risk"), col("d_events"),
          col("c_censored"), col("survival"))
        .orderBy("lifetime_days")
    }),

    /** POISSON GLM (log link) on per-(user, day) event counts — the
      * count-data member of the GLM family next to the registry's
      * logistic (`ml_calibration_bins`) and OLS surfaces: rate ~
      * day-of-week, the demand-seasonality regression a forecasting desk
      * runs on arrival counts. FULL ORACLE (r15): the one-hot
      * day-of-week design is SATURATED, so the Poisson MLE has a closed
      * form — μ̂ₖ = the per-dow mean count (exact BIGINT/BIGINT
      * division), intercept = ln μ̂₁, coefficients = ln μ̂ₖ − ln μ̂₁ —
      * which is BOTH the exact optimum MLlib's IRLS only approaches at
      * tolerance AND the better scale story (ONE keyed aggregation, no
      * iterations). Deviance/AIC fold over the (y, dow) CONTINGENCY
      * (counts are small integers — the sufficient statistics are
      * ≤ |y-range|·7 cells at any SF) as exact DECIMAL sums of
      * 1e-9-gridded terms; ln-factorial is the explicit ascending
      * left-associated fold both engines replay. dow derives from the
      * epoch day ((day+4) % 7 + 1 — Spark's 1=Sunday convention, but
      * engine-portable arithmetic instead of `dayofweek`). Output
      * long-form: per-term coefficient and rate ratio, then
      * deviance/AIC and the mean-balance pair (Σ fitted ≡ Σ observed —
      * the log-link score equation MlSpec pins). */
    "ml_poisson_glm" -> ((s, d) => {
      import s.implicits._
      val counts = Tables.events(s, d)
        .select(col("user_id"), Tables.epochDay(col("ts")).as("day"))
        .withColumn("dow", expr("CAST((day + 4) % 7 + 1 AS INT)"))
        .groupBy("user_id", "day", "dow")
        .agg(count(lit(1)).as("y"))
      val cont = counts.groupBy("dow", "y").agg(count(lit(1)).as("c"))
        .collect() // (y, dow) contingency: ≤ |y-range|·7 cells at any SF
      val perDow = cont.groupBy(_.getAs[Int]("dow")).map { case (k, rows) =>
        val nk = rows.map(_.getAs[Long]("c")).sum
        val sk = rows.map(r => r.getAs[Long]("c") * r.getAs[Long]("y")).sum
        k -> (nk, sk)
      }
      val dows = perDow.keys.toSeq.sorted
      require(dows == (1 to 7), s"ml_poisson_glm: dows $dows != 1..7")
      val mu = perDow.map { case (k, (nk, sk)) => k -> sk.toDouble / nk }
      val nTot = perDow.values.map(_._1).sum
      val sTot = perDow.values.map(_._2).sum
      def r9bd(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      def r6(v: Double) =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      // deviance & log-lik terms over the contingency: each term is a
      // function of identical doubles in both engines, gridded to 1e-9
      // and summed exactly (order-free) — ln-factorial is the ascending
      // left-associated fold from 0.0, the oracle's list_reduce text
      def lfact(y: Long): Double =
        (2L to y).foldLeft(0.0)((a, i) => a + math.log(i.toDouble))
      val dev = 2.0 * cont.map { r =>
        val y = r.getAs[Long]("y").toDouble
        val m = mu(r.getAs[Int]("dow"))
        r9bd(y * math.log(y / m) - (y - m)) * r.getAs[Long]("c")
      }.foldLeft(BigDecimal(0))(_ + _).toDouble
      val ll = cont.map { r =>
        val y = r.getAs[Long]("y")
        val m = mu(r.getAs[Int]("dow"))
        r9bd(y * math.log(m) - m - lfact(y)) * r.getAs[Long]("c")
      }.foldLeft(BigDecimal(0))(_ + _).toDouble
      val aic = 2.0 * 7 - 2.0 * ll
      val meanFit = perDow.toSeq.map { case (k, (nk, _)) =>
        r9bd(nk * mu(k))
      }.foldLeft(BigDecimal(0))(_ + _).toDouble / nTot
      val coefRows = (1 to 7).map { k =>
        val cf = if (k == 1) math.log(mu(1)) else math.log(mu(k)) - math.log(mu(1))
        val term = if (k == 1) "intercept" else s"dow_$k"
        (term, r6(cf), Some(r6(math.exp(cf))))
      }
      val sumRows = Seq(
        ("deviance", r6(dev), None),
        ("aic", r6(aic), None),
        ("n_obs", nTot.toDouble, None),
        ("mean_observed", r6(sTot.toDouble / nTot), None),
        ("mean_fitted", r6(meanFit), None))
      (coefRows ++ sumRows).toDF("term", "estimate", "rate_ratio")
        .orderBy("term")
    }),

    /** `ml_quantile_regression`: linear τ-quantile regression (Koenker &
      * Bassett) at τ ∈ {0.1, 0.5, 0.9} on the 30-minute frame — the
      * covariate-DEPENDENT risk band next to `ml_conformal_interval`'s
      * constant-width one. FULL ORACLE (r16): EXPECTILE-IRLS with
      * exact empirical τ-recalibration. The smoothed-pinball IRLS the
      * `ml_huber` precedent suggested was measured CHAOTIC (a 1e-9
      * start perturbation grows to an O(0.1) parameter gap — the
      * 1/max(|r|, ε) weight amplifies near-pinned rows at every
      * tested (ε, damping, ridge) point), so the convertible ladder
      * is the asymmetric-least-squares one (Newey & Powell 1987):
      * w ∈ {τ, 1−τ} by residual sign — BOUNDED weights and a FINITE
      * sign-pattern state space, so the ladder converges
      * IDEMPOTENTLY in ≤3 steps here and cross-engine term-cast
      * drift is memoryless ([[IrlsCore.QuantileSteps]] = 12 for
      * margin). The intercept is then RECALIBRATED by the exact
      * Spark-percentile_τ of the expectile residuals
      * ([[IrlsCore.pctAt]]) — in-sample coverage ≈ τ to within one
      * order statistic BY CONSTRUCTION (measured 0.100/0.500/0.900;
      * mean pinball within 0.5 % of the true L-BFGS quantile fit's).
      * ONE collect of the calendar-bounded frame, driver replay of
      * the whole ladder ([[IrlsCore.expectileQuantileLadder]] — also
      * law-pinned on planted data in MlSpec); the oracle rides all
      * three τ and all 12 steps through ONE recursive CTE with the
      * Cholesky as chained LATERALs ([[quantileSql]], generated from
      * the same [[IrlsCore]]). Output per τ: calibrated intercept,
      * coverage, mean exact pinball loss. The L-BFGS
      * `ml/Quantile.scala` path stays the library's distributed
      * large-frame surface. */
    "ml_quantile_regression" -> ((s, d) => {
      import s.implicits._
      import java.math.{BigDecimal => JBD}
      val feats = ModelingFrame.EventTypes
      val rows = ModelingFrame.buildFine(s, d)
        .select(col(ModelingFrame.Target).as("y") +: feats.map(col): _*)
        .collect()
        .map(r => (r.getDouble(0), Array.tabulate(feats.size + 1)(i =>
          if (i == 0) 1.0 else r.getDouble(i))))
      val p = feats.size + 1
      val out = IrlsCore.QuantileTaus.map { tau =>
        val (b, delta) = IrlsCore.expectileQuantileLadder(rows, p, tau)
        // coverage: exact-integer indicator mean on RAW doubles (both
        // engines compute the predictor bit-identically — no rounding,
        // no ties); pinball: exact-decimal sum of 1e-9-gridded terms
        var nCov = 0L; var spb = JBD.ZERO
        rows.foreach { case (y, x) =>
          val pr = IrlsCore.pred(b, x) + delta
          if (y <= pr) nCov += 1
          spb = spb.add(IrlsCore.d9(
            if (y >= pr) tau * (y - pr) else (1.0 - tau) * (pr - y)))
        }
        val n = rows.length
        (tau, Grid.r6z(b(0) + delta), Grid.r6z(nCov.toDouble / n),
          Grid.r6z(spb.doubleValue / n))
      }
      out.toDF("tau", "intercept", "coverage", "pinball").orderBy("tau")
    }),

    /** `ml_pca`: principal components of the 30-minute feature frame —
      * the dimensionality-reduction staple of every feature pipeline
      * (the reference's correlated multi-market columns are the classic
      * PCA input). FULL ORACLE (r16): the `ml_pca_power` fixed-
      * iteration discipline extended to the GENERAL-k ladder — exact
      * DECIMAL covariance moments (the 1e-6-grid features make every
      * product exactly representable at 1e-12: NOTHING is rounded
      * before the grid), the k×k covariance re-gridded 1e-9, then k
      * power recursions of 150 steps each (per-step 1e-9 re-round,
      * index-ordered folds) with rank-1 deflation on the grid between
      * components; sklearn's svd_flip sign (largest-|loading|
      * coordinate positive — decided on grid values, first-index tie
      * break on both engines). Eigenvalue = Rayleigh quotient on the
      * CURRENT deflated matrix (= the component's variance share);
      * explained ratio over the trace. ONE collect of the calendar-
      * bounded frame, driver replay of the ladder; the twin
      * ([[pcaSql]]) chains five single-row-state recursions. The
      * breeze eigen-solve `ml/Pca.scala` stays the library's
      * general-purpose surface (MlSpec pins the two agree on planted
      * structure: recovery, orthonormality, variance accounting). */
    "ml_pca" -> ((s, d) => {
      import s.implicits._
      import java.math.{BigDecimal => JBD}
      val feats = ModelingFrame.EventTypes
      val k = feats.size
      val rows = ModelingFrame.buildFine(s, d)
        .select(feats.map(col): _*)
        .collect()
        .map(r => Array.tabulate(k)(r.getDouble))
      val n = rows.length
      // exact DECIMAL moments: features are 1e-6-grid, products exact
      // at 1e-12 — replay as setScale(6) BigDecimals, never doubles
      def d6(x: Double) = new JBD(java.lang.Double.toString(x)).setScale(6)
      val sD = Array.fill(k)(JBD.ZERO)
      val pD = Array.fill(k, k)(JBD.ZERO)
      rows.foreach { x =>
        val xd = x.map(d6)
        for (i <- 0 until k) {
          sD(i) = sD(i).add(xd(i))
          for (j <- i until k) pD(i)(j) = pD(i)(j).add(xd(i).multiply(xd(j)))
        }
      }
      val sV = sD.map(_.doubleValue)
      def pV(i: Int, j: Int) = pD(math.min(i, j))(math.max(i, j)).doubleValue
      // covariance with the n−1 denominator (sklearn), re-gridded 1e-9
      val m1 = Array.tabulate(k, k)((i, j) =>
        Grid.r9((pV(i, j) - sV(i) * sV(j) / n) / (n - 1)) + 0.0)
      def mv(m: Array[Array[Double]], v: Array[Double], g: Int): Double =
        (0 until k).map(j => m(g)(j) * v(j)).reduceLeft(_ + _)
      def power(m: Array[Array[Double]]): Array[Double] = {
        val v0 = Grid.r9(1.0 / math.sqrt(k.toDouble))
        var v = Array.fill(k)(v0)
        for (_ <- 1 to 150) {
          val w = Array.tabulate(k)(g => mv(m, v, g))
          val nrm = math.sqrt((0 until k).map(g => w(g) * w(g)).reduceLeft(_ + _))
          v = Array.tabulate(k)(g => Grid.r9(w(g) / nrm) + 0.0)
        }
        // sklearn svd_flip: the largest-|loading| coordinate positive
        // (first index wins ties — list_position ↔ maxBy, both first)
        if (v(v.indices.maxBy(i => math.abs(v(i)))) < 0)
          v.map(x => -x + 0.0) else v
      }
      def rayleigh(m: Array[Array[Double]], v: Array[Double]): Double =
        Grid.r9((0 until k).map(g => v(g) * mv(m, v, g)).reduceLeft(_ + _))
      val tr = Grid.r9((0 until k).map(i => m1(i)(i)).reduceLeft(_ + _))
      var cur = m1
      val out = (1 to k).flatMap { c =>
        val v = power(cur)
        val lam = rayleigh(cur, v)
        if (c < k)
          cur = Array.tabulate(k, k)((i, j) =>
            Grid.r9(cur(i)(j) - lam * v(i) * v(j)) + 0.0)
        feats.indices.map(i =>
          (c, feats(i), Grid.r6z(v(i)), Grid.r6z(lam), Grid.r6z(lam / tr)))
      }
      out.toDF("component", "feature", "loading", "eigenvalue",
        "explained_ratio").orderBy("component", "feature")
    }),

    "ml_gridsearch" -> ((s, d) => {
      import s.implicits._
      withFrame(s, d) { df =>
        val cuts = Evaluation.timeCuts(df, "date_id", 2)
        val folds = Evaluation.walkForwardSplits(df, "date_id", cuts)
          .filter { case (tr, te) => !tr.isEmpty && !te.isEmpty }
          .map { case (tr, te) => (tr.cache(), te.cache()) }
        try {
          // penalty rescale stats are per TRAINING fold (one tiny agg each)
          val foldStats = folds.map { case (tr, _) =>
            Models.labelStats(tr, ModelingFrame.Target) }
          val grid = Seq(0.01, 0.1, 1.0, 10.0)
          // every (alpha, fold) cell is an independent fit+score — run
          // them on parallel driver threads (same pattern as the ensemble)
          val cells = Models.inParallel(
            for { alpha <- grid; ((train, test), (n, sy)) <- folds.zip(foldStats) }
              yield { () =>
                val m = Models.ridge(ModelingFrame.Target, alpha, n, sy).fit(train)
                val pred = m.transform(test).select(
                  col(ModelingFrame.Target).as("y"), col(Models.PredictionCol).as("yhat"))
                alpha -> Evaluation.metricsFull(pred, "y", "yhat").head().getAs[Double]("rmse")
              })
          val scores = grid.map { alpha =>
            val rmses = cells.collect { case (a, r) if a == alpha => r }
            (alpha, math.rint(rmses.sum / rmses.size * 1e6) / 1e6)
          }
          val best = scores.minBy(_._2)._1
          scores.map { case (a, r) => (a, r, a == best) }
            .toDF("alpha", "mean_rmse", "is_best").orderBy("alpha")
        } finally folds.foreach { case (tr, te) => tr.unpersist(); te.unpersist() }
      }
    }),
  )

  /** Almost all entries are rows-only by design (see object Scaladoc) —
    * DuckDB has no multi-feature OLS/RF/GBT. Two exceptions:
    * `ml_scaler` (z-scaling's postcondition — per-feature mean 0 /
    * sample std 1 over the SAME modeling frame — IS SQL-expressible, so
    * its twin rebuilds the frame and recomputes the scaled moments;
    * `round(x, 6) + 0.0` on both sides canonicalizes −0.0) and
    * `ml_trend_per_series` (the 3-feature OLS closed form via Cramer on
    * the Gram sums — see the query's Scaladoc). */
  private val Feats = Vector("click", "error", "purchase", "signup", "view")

  /** CTE prelude solving (Xcᵀ Xc + αI) β = Xcᵀ yc on the 5-feature
    * modeling frame — the sklearn Ridge closed form `Models.ridge` is
    * calibrated to (α = 0 gives plain OLS), pinned on the real reference
    * data by GoldenParitySpec; the intercept is unpenalized and
    * recovered from means. The 5×5 system is solved by two SYMMETRIC
    * Gaussian-elimination steps (generated as flat per-CTE expressions —
    * symmetry keeps only the upper triangle alive), a 3×3 Cramer finish,
    * and back-substitution. MLlib's WLS path is a direct Cholesky solve,
    * so engine and oracle agree to ~1e-10 — far inside the 1e-6
    * rounding. Ends with CTE `fin` carrying b0..b4, b_int, a0..a4, ay. */
  private def olsCtes(alpha: Double, src: String = "clean",
                      sfx: String = "", feats: Seq[String] = Feats,
                      yCol: String = "tgt"): String = {
    val n = feats.size
    require(n >= 3, "elimination generator needs >= 3 regressors")
    // stage prefixes: q0 = centered n×n, q1 after one elimination, …
    // down to the 3×3 at stage n−3
    def pre(t: Int): String = s"q$t"
    // upper-triangle index helper: the stored name for A[i][j], i ≤ j
    def ut(p: String, i: Int, j: Int): String =
      if (i <= j) s"$p$i$j" else s"$p$j$i"
    val rawSums =
      (for { i <- 0 until n; j <- i until n }
        yield s"sum(${feats(i)}*${feats(j)}) AS s$i$j") ++
      (0 until n).map(i => s"sum(${feats(i)}*$yCol) AS sy$i") ++
      (0 until n).map(i => s"avg(${feats(i)}) AS a$i") ++
      Seq("count(*)::DOUBLE AS nn", s"avg($yCol) AS ay")
    val centered =
      (for { i <- 0 until n; j <- i until n } yield {
        val diag = if (i == j) s" + $alpha" else ""
        s"s$i$j - nn*a$i*a$j$diag AS ${pre(0)}$i$j"
      }) ++
      (0 until n).map(i => s"sy$i - nn*a$i*ay AS ${pre(0)}y$i")
    // one symmetric elimination step: drop the highest index k = size-1
    def elim(t: Int): Seq[String] = {
      val (p, nx) = (pre(t), pre(t + 1))
      val k = n - t - 1
      (for { i <- 0 until k; j <- i until k }
        yield s"${ut(p, i, j)} - ${ut(p, i, k)}*${ut(p, j, k)}/${ut(p, k, k)} AS $nx$i$j") ++
      (0 until k).map(i =>
        s"${p}y$i - ${ut(p, i, k)}*${p}y$k/${ut(p, k, k)} AS ${nx}y$i")
    }
    val elimCtes = (0 until n - 3).map(t =>
      s"""el$t$sfx AS (SELECT *, ${elim(t).mkString(",\n    ")} FROM ${
         if (t == 0) s"c$sfx" else s"el${t - 1}$sfx"}),""").mkString("\n")
    val z = pre(n - 3) // the 3×3 stage
    // back-substitution: var v (3 ≤ v < n) from stage n−1−v, in order
    val backCtes = (3 until n).map { v =>
      val p = pre(n - 1 - v)
      val prior = if (v == 3) s"beta$sfx" else s"back${v - 1}$sfx"
      s"""back$v$sfx AS (SELECT *,
         |    (${p}y$v - ${(0 until v).map(i => s"${ut(p, i, v)}*b$i").mkString(" - ")}) / ${ut(p, v, v)} AS b$v FROM $prior),""".stripMargin
    }.mkString("\n")
    val lastBack = if (n == 3) s"beta$sfx" else s"back${n - 1}$sfx"
    s""", g$sfx AS (SELECT ${rawSums.mkString(",\n    ")} FROM $src),
       |c$sfx AS (SELECT *, ${centered.mkString(",\n    ")} FROM g$sfx),
       |$elimCtes
       |sol$sfx AS (SELECT *,
       |    ${z}00*(${z}11*${z}22 - ${z}12*${z}12) - ${z}01*(${z}01*${z}22 - ${z}12*${z}02) + ${z}02*(${z}01*${z}12 - ${z}11*${z}02) AS det,
       |    ${z}y0*(${z}11*${z}22 - ${z}12*${z}12) - ${z}01*(${z}y1*${z}22 - ${z}12*${z}y2) + ${z}02*(${z}y1*${z}12 - ${z}11*${z}y2) AS det0,
       |    ${z}00*(${z}y1*${z}22 - ${z}y2*${z}12) - ${z}y0*(${z}01*${z}22 - ${z}12*${z}02) + ${z}02*(${z}01*${z}y2 - ${z}y1*${z}02) AS det1,
       |    ${z}00*(${z}11*${z}y2 - ${z}12*${z}y1) - ${z}01*(${z}01*${z}y2 - ${z}y1*${z}02) + ${z}y0*(${z}01*${z}12 - ${z}11*${z}02) AS det2
       |  FROM ${if (n == 3) s"c$sfx" else s"el${n - 4}$sfx"}),
       |beta$sfx AS (SELECT *,
       |    det0/det AS b0, det1/det AS b1, det2/det AS b2 FROM sol$sfx),
       |$backCtes
       |fin$sfx AS (SELECT *,
       |    ay - ${(0 until n).map(i => s"a$i*b$i").mkString(" - ")} AS b_int FROM $lastBack)""".stripMargin
  }

  /** Shared frame-reconstruction prelude (`ModelingFrame.build` in SQL —
    * the same CTEs `ml_scaler`'s twin validates). */
  private val frameCtes: String =
    Pipe.dailySql +
      """, frame AS (
        |  SELECT d.*, lead(click) OVER (ORDER BY date_id) AS tgt FROM daily d),
        |clean AS (
        |  SELECT date_id, click, error, purchase, signup, view, tgt FROM frame
        |  WHERE click IS NOT NULL AND error IS NOT NULL AND purchase IS NOT NULL
        |    AND signup IS NOT NULL AND view IS NOT NULL AND tgt IS NOT NULL)""".stripMargin

  /** Coefficient-table tail shared by `ml_ridge`'s twin. */
  private def coefSql(alpha: Double): String =
    frameCtes + olsCtes(alpha) +
      s"""
         |SELECT feature, round(coefficient, 6) AS coefficient FROM (
         |  ${Feats.zipWithIndex.map { case (name, i) =>
               s"SELECT '$name' AS feature, b$i AS coefficient FROM fin"
             }.mkString("\n  UNION ALL ")}
         |  UNION ALL SELECT '__intercept', b_int FROM fin)
         |ORDER BY feature""".stripMargin

  /** `ml_shap` twin: exact linear SHAP of the OLS fit — per feature
    * mean |φ| = |wⱼ|·avg|xⱼ−μⱼ| (one extra pass over the frame with the
    * fitted weights), mean φ (≡ 0 over the background frame; `+ 0.0`
    * canonicalizes the −0.0 the 1e-17 noise can round to), coefficient,
    * and base = w·μ + b. */
  private def shapSql: String =
    frameCtes + olsCtes(0.0) +
      s""",
         |phi AS (SELECT ${Feats.zipWithIndex.map { case (name, i) =>
               s"avg(abs(b$i*($name - a$i))) AS pa$i, avg(b$i*($name - a$i)) AS pm$i"
             }.mkString(",\n    ")},
         |    ${(0 until Feats.size).map(i => s"any_value(b$i) AS w$i").mkString(", ")},
         |    any_value(b_int) AS w_int,
         |    ${(0 until Feats.size).map(i => s"any_value(a$i) AS m$i").mkString(", ")}
         |  FROM clean, fin)
         |SELECT feature, round(mean_abs_shap, 6) AS mean_abs_shap,
         |  round(mean_shap, 6) + 0.0 AS mean_shap,
         |  round(coefficient, 6) AS coefficient, round(base_value, 6) AS base_value
         |FROM (
         |  ${Feats.zipWithIndex.map { case (name, i) =>
               s"SELECT '$name' AS feature, pa$i AS mean_abs_shap, pm$i AS mean_shap, " +
               s"w$i AS coefficient, ${(0 until Feats.size).map(j => s"w$j*m$j").mkString(" + ")} + w_int AS base_value FROM phi"
             }.mkString("\n  UNION ALL ")})
         |ORDER BY feature""".stripMargin

  /** `ml_walk_forward` twin: the expanding-window protocol is fully
    * deterministic — cuts from the date_id min/max (floor() mirrors
    * Scala's toLong truncation; DuckDB's float→int CAST would round),
    * per-fold OLS via the elimination closed form, test-set RMSE/MAE
    * from the fitted weights. Verifies the leakage-free splitter AND
    * each fold's fit in one hash row per fold. */
  private def walkForwardSql: String = {
    val k = 3
    val cutExprs = (1 to k).map(i =>
      s"lo + floor((hi - lo) * ${k + i}.0 / ${2 * k}.0)::BIGINT AS cut$i")
    val folds = (1 to k).map { i =>
      val testPred =
        if (i < k) s"date_id >= cut$i AND date_id < cut${i + 1}"
        else s"date_id >= cut$i"
      (s"""train$i AS (SELECT c.* FROM clean c, cvals WHERE date_id < cut$i),
          |test$i AS (SELECT c.* FROM clean c, cvals WHERE $testPred)""".stripMargin,
        olsCtes(0.0, src = s"train$i", sfx = s"_f$i"),
        s"""m$i AS (SELECT ${i - 1} AS fold, count(*)::BIGINT AS n_test,
           |    sqrt(avg(pow(tgt - (b_int + ${Feats.zipWithIndex.map {
                  case (nm, j) => s"b$j*$nm" }.mkString(" + ")}), 2))) AS rmse,
           |    avg(abs(tgt - (b_int + ${Feats.zipWithIndex.map {
                  case (nm, j) => s"b$j*$nm" }.mkString(" + ")}))) AS mae
           |  FROM test$i, fin_f$i)""".stripMargin)
    }
    frameCtes +
      s""",
         |bounds AS (SELECT min(date_id)::BIGINT AS lo, max(date_id)::BIGINT AS hi FROM clean),
         |cvals AS (SELECT ${cutExprs.mkString(", ")} FROM bounds),
         |${folds.map(_._1).mkString(",\n")}${folds.map(_._2).mkString("")},
         |${folds.map(_._3).mkString(",\n")}
         |SELECT fold, n_test, round(rmse, 6) AS rmse, round(mae, 6) AS mae FROM (
         |  ${(1 to k).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")})
         |ORDER BY fold""".stripMargin
  }

  /** `ml_conformal_interval` twin: the full split-conformal protocol —
    * same integer µs-clock 50/75% cuts, train-side OLS by the
    * elimination closed form over the same five row-level regressors,
    * calibration |residual| scores, the ⌈0.9·(n_cal+1)⌉-th order
    * statistic via row_number (integer-ceil arithmetic identical to the
    * engine's), and test coverage on the 1e-6-rounded comparison. */
  private def conformalSql: String = {
    val cfeats = Vector("f_error", "f_purchase", "f_signup", "f_view", "f_hour")
    val pred = s"b_int + ${cfeats.zipWithIndex.map {
      case (nm, j) => s"b$j*$nm" }.mkString(" + ")}"
    s"""WITH base AS (
       |  SELECT event_id, epoch_us(ts)::BIGINT AS ts_us,
       |    CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END AS f_error,
       |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS f_purchase,
       |    CASE WHEN event_type = 'signup' THEN 1.0 ELSE 0.0 END AS f_signup,
       |    CASE WHEN event_type = 'view' THEN 1.0 ELSE 0.0 END AS f_view,
       |    CAST(date_part('hour', ts) AS DOUBLE) AS f_hour,
       |    value AS y
       |  FROM events),
       |bounds AS (SELECT min(ts_us)::BIGINT AS lo, max(ts_us)::BIGINT AS hi FROM base),
       |cvals AS (SELECT lo + (hi - lo) // 2 AS c1, lo + ((hi - lo) * 3) // 4 AS c2 FROM bounds),
       |train AS (SELECT b.* FROM base b, cvals WHERE ts_us < c1),
       |cal AS (SELECT b.* FROM base b, cvals WHERE ts_us >= c1 AND ts_us < c2),
       |test AS (SELECT b.* FROM base b, cvals WHERE ts_us >= c2)${
         olsCtes(0.0, src = "train", feats = cfeats, yCol = "y")},
       |calr AS (SELECT event_id, abs(y - ($pred)) AS r FROM cal, fin),
       |kv AS (SELECT count(*)::BIGINT AS n_cal,
       |         (9 * (count(*) + 1) + 9) // 10 AS k FROM calr),
       |qv AS (SELECT max(r) AS q FROM (
       |         SELECT r, row_number() OVER (ORDER BY r, event_id) AS rn FROM calr) x, kv
       |       WHERE x.rn <= kv.k),
       |tr AS (SELECT event_id, abs(y - ($pred)) AS r FROM test, fin),
       |cv AS (SELECT count(*)::BIGINT AS n_test,
       |         avg(CASE WHEN round(tr.r, 6) <= round(qv.q, 6)
       |                  THEN 1.0 ELSE 0.0 END) AS coverage
       |       FROM tr, qv)
       |SELECT (SELECT count(*)::BIGINT FROM train) AS n_train,
       |  kv.n_cal, cv.n_test, kv.k::BIGINT AS k,
       |  round(qv.q, 6) AS q_hat, round(cv.coverage, 6) AS coverage,
       |  round(2 * qv.q, 6) AS avg_width
       |FROM kv, qv, cv""".stripMargin
  }

  /** `ml_gridsearch` twin: every (α, fold) cell is one elimination
    * chain (generated — 8 chains for the 4-point grid over 2
    * walk-forward folds); mean test RMSE per α, best = min of the
    * ROUNDED means exactly like the engine. */
  private def gridSearchSql: String = {
    val k = 2
    val grid = Seq(0.01, 0.1, 1.0, 10.0)
    val cutExprs = (1 to k).map(i =>
      s"lo + floor((hi - lo) * ${k + i}.0 / ${2 * k}.0)::BIGINT AS cut$i")
    val foldDefs = (1 to k).map { i =>
      val testPred =
        if (i < k) s"date_id >= cut$i AND date_id < cut${i + 1}"
        else s"date_id >= cut$i"
      s"""train$i AS (SELECT c.* FROM clean c, cvals WHERE date_id < cut$i),
         |test$i AS (SELECT c.* FROM clean c, cvals WHERE $testPred)""".stripMargin
    }
    val pred = s"b_int + ${Feats.zipWithIndex.map {
      case (nm, j) => s"b$j*$nm" }.mkString(" + ")}"
    val chains = for { (a, ai) <- grid.zipWithIndex; i <- 1 to k }
      yield olsCtes(a, src = s"train$i", sfx = s"_a${ai}_f$i")
    val cells = for { (a, ai) <- grid.zipWithIndex; i <- 1 to k } yield
      s"""cell_a${ai}_f$i AS (SELECT $a::DOUBLE AS alpha,
         |    sqrt(avg(pow(tgt - ($pred), 2))) AS rmse
         |  FROM test$i, fin_a${ai}_f$i)""".stripMargin
    frameCtes +
      s""",
         |bounds AS (SELECT min(date_id)::BIGINT AS lo, max(date_id)::BIGINT AS hi FROM clean),
         |cvals AS (SELECT ${cutExprs.mkString(", ")} FROM bounds),
         |${foldDefs.mkString(",\n")}${chains.mkString("")},
         |${cells.mkString(",\n")},
         |scores AS (
         |  SELECT alpha, round(avg(rmse), 6) AS mean_rmse FROM (
         |    ${cells.indices.map { idx =>
                val (ai, i) = (idx / k, idx % k + 1)
                s"SELECT * FROM cell_a${ai}_f$i" }.mkString(" UNION ALL ")})
         |  GROUP BY alpha)
         |SELECT alpha, mean_rmse,
         |  mean_rmse = min(mean_rmse) OVER () AS is_best
         |FROM scores ORDER BY alpha""".stripMargin
  }

  /** `ml_sarima` twin: SARIMA(3,1,0)(1,0,0)_7 conditional least squares
    * is OLS on a window-built design — d=1 differencing, AR lags 1..3
    * and the seasonal lag 7 (all SQL windows), solved by the generic
    * elimination generator (4 regressors → one elimination step).
    * The 1-step forecast re-reads the design tail POSITIONALLY
    * (row_number desc, rows 1,2,3,7) exactly like the engine's
    * orderBy-desc-limit tail, and undoes the d=1 difference with the
    * latest observed level. */
  private def sarimaSql: String = {
    val lags = Seq(1, 2, 3, 7)
    val fs = lags.indices.map(i => s"f$i")
    Pipe.dailySql +
      s""", diffd AS (
         |  SELECT date_id, click,
         |    click - lag(click, 1) OVER (ORDER BY date_id) AS sar_y
         |  FROM daily),
         |des AS (SELECT *,
         |    ${lags.zipWithIndex.map { case (k, i) =>
                s"lag(sar_y, $k) OVER (ORDER BY date_id) AS f$i" }.mkString(",\n    ")}
         |  FROM diffd),
         |r AS (SELECT * FROM des
         |  WHERE click IS NOT NULL AND sar_y IS NOT NULL
         |    AND ${fs.map(f => s"$f IS NOT NULL").mkString(" AND ")})""".stripMargin +
      olsCtes(0.0, src = "r", sfx = "", feats = fs, yCol = "sar_y") +
      s""",
         |met AS (SELECT 1.0 - sum(pow(sar_y - (b_int + ${fs.zipWithIndex.map {
                 case (f, i) => s"b$i*$f" }.mkString(" + ")}), 2))
         |            / sum(pow(sar_y - ay, 2)) AS r2
         |  FROM r, fin),
         |tl AS (SELECT sar_y, click, row_number() OVER (ORDER BY date_id DESC) AS rn FROM r),
         |tv AS (SELECT
         |    ${lags.zipWithIndex.map { case (k, i) =>
                s"max(CASE WHEN rn = $k THEN sar_y END) AS v$i" }.mkString(",\n    ")},
         |    max(CASE WHEN rn = 1 THEN click END) AS y_t
         |  FROM tl WHERE rn <= ${lags.max})
         |SELECT
         |  round(b_int + ${fs.indices.map(i => s"b$i*v$i").mkString(" + ")} + y_t, 6) AS forecast_next,
         |  round(r2, 6) AS train_r2,
         |  3 AS p, 1 AS d, 1 AS big_p, 0 AS big_d, 7 AS s
         |FROM fin, met, tv""".stripMargin
  }

  /** `ml_sarima_hybrid` twin: two chained elimination solves — the SAR
    * conditional-least-squares fit (α=0) on the design, then sklearn
    * Ridge(α=1) of the 4 lag-1 exogenous features against the SAR
    * residuals — and the (r2, dir_acc) comparison table of both
    * predictors over the same frame. Note the hybrid's design drops a
    * DIFFERENT null subset than `ml_sarima` (it additionally requires
    * the exog lags), so the SAR betas here are fitted on ITS rows. */
  private def hybridSql: String = {
    val lags = Seq(1, 2, 3, 7)
    val fs = lags.indices.map(i => s"f$i")
    val exog = Seq("error", "purchase", "signup", "view")
    val es = exog.indices.map(i => s"e$i")
    val sarPred = s"b_int + ${fs.zipWithIndex.map { case (f, i) => s"b$i*$f" }.mkString(" + ")}"
    val ridgePred = s"b_int + ${es.zipWithIndex.map { case (e, i) => s"b$i*$e" }.mkString(" + ")}"
    def metrics(src: String, yhat: String): String =
      s"""SELECT 1.0 - sum(pow(sar_y - $yhat, 2)) / sum(pow(sar_y - my, 2)) AS r2,
         |    avg(CASE WHEN sign(sar_y) = sign($yhat) THEN 1.0 ELSE 0.0 END) AS dir_acc
         |  FROM $src, ym""".stripMargin
    Pipe.dailySql +
      s""", diffd AS (
         |  SELECT date_id, click,
         |    ${exog.zipWithIndex.map { case (c, i) =>
                s"lag($c, 1) OVER (ORDER BY date_id) AS e$i" }.mkString(",\n    ")},
         |    click - lag(click, 1) OVER (ORDER BY date_id) AS sar_y
         |  FROM daily),
         |des AS (SELECT *,
         |    ${lags.zipWithIndex.map { case (k, i) =>
                s"lag(sar_y, $k) OVER (ORDER BY date_id) AS f$i" }.mkString(",\n    ")}
         |  FROM diffd),
         |r AS (SELECT * FROM des
         |  WHERE sar_y IS NOT NULL
         |    AND ${(fs ++ es).map(c => s"$c IS NOT NULL").mkString(" AND ")})""".stripMargin +
      olsCtes(0.0, src = "r", sfx = "_s", feats = fs, yCol = "sar_y") +
      s""",
         |rr AS (SELECT r.*, sar_y - ($sarPred) AS resid, ($sarPred) AS yhat_sar
         |  FROM r, fin_s)""".stripMargin +
      olsCtes(1.0, src = "rr", sfx = "_r", feats = es, yCol = "resid") +
      s""",
         |sc AS (SELECT rr.sar_y, rr.yhat_sar,
         |    rr.yhat_sar + ($ridgePred) AS yhat_hyb
         |  FROM rr, fin_r),
         |ym AS (SELECT avg(sar_y) AS my FROM rr),
         |msar AS (${metrics("rr", "yhat_sar")}),
         |mhyb AS (${metrics("sc", "yhat_hyb")})
         |SELECT model, round(r2, 6) AS r2, round(dir_acc, 6) AS dir_acc FROM (
         |  SELECT 'sar' AS model, r2, dir_acc FROM msar
         |  UNION ALL SELECT 'sar_ridge_hybrid', r2, dir_acc FROM mhyb)
         |ORDER BY model""".stripMargin
  }

  /** The DuckDB twin of `ml_influence_diagnostics` (r14 — unblocked by
    * the grid-6 fine frame). Frame: the buildFine replay (grid-6 pivot
    * means, ffill/bfill via IGNORE-NULLS windows, next-bucket target,
    * dense-row filter). Solve: the SAME shared-order no-pivot Cholesky
    * the engine runs (the `minVarianceSql` doctrine — every fold
    * left-associated ascending-index over CAST-to-DOUBLE DECIMAL
    * moments, so every double is bit-identical), leverage as the
    * forward-substitution norm ‖L⁻¹x‖² with the identical nested
    * expression shape, Cook's distance and the 4/n flag on the same
    * rounded grid. */
  private def influenceSql: String = {
    val types = ModelingFrame.EventTypes
    val k = types.length + 1 // intercept column first, as the engine's xcols
    def xRef(i: Int) = if (i == 0) "1.0" else types(i - 1)
    def aRef(i: Int, j: Int) = s"a_${math.min(i, j)}_${math.max(i, j)}"
    val px = types.map(t => s"max(CASE WHEN event_type = '$t' THEN m END) AS $t")
    val fill = types.map(t =>
      s"coalesce(last_value($t IGNORE NULLS) OVER (ORDER BY bucket_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        s"first_value($t IGNORE NULLS) OVER (ORDER BY bucket_id " +
        s"ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS $t")
    val xxCols = for (i <- 0 until k; j <- i until k) yield
      s"sum(CAST(${xRef(i)} * ${xRef(j)} AS DECIMAL(38,10))) AS xx_${i}_$j"
    val xyCols = (0 until k).map(i =>
      s"sum(CAST(${xRef(i)} * y AS DECIMAL(38,10))) AS xy_$i")
    val aCols = (for (i <- 0 until k; j <- i until k) yield
      s"CAST(xx_${i}_$j AS DOUBLE) AS a_${i}_$j") ++
      (0 until k).map(i => s"CAST(xy_$i AS DOUBLE) AS xyd_$i") :+
      "CAST(yy AS DOUBLE) AS yyd"
    val chol = (0 until k).flatMap { j =>
      val dTerms = (0 until j).map(m => s" - l_${j}_$m * l_${j}_$m").mkString
      val diag = s"chd$j AS MATERIALIZED (SELECT *, " +
        s"sqrt(${aRef(j, j)}$dTerms) AS l_${j}_$j FROM " +
        (if (j == 0) "cv" else s"cho${j - 1}") + ")"
      if (j == k - 1) Seq(diag)
      else {
        val below = (j + 1 until k).map { i =>
          val t = (0 until j).map(m => s" - l_${i}_$m * l_${j}_$m").mkString
          s"(${aRef(i, j)}$t) / l_${j}_$j AS l_${i}_$j"
        }.mkString(",\n    ")
        Seq(diag, s"cho$j AS MATERIALIZED (SELECT *,\n    $below FROM chd$j)")
      }
    }
    val fwd = (0 until k).map { i =>
      val t = (0 until i).map(m => s" - l_${i}_$m * z_$m").mkString
      val src = if (i == 0) s"chd${k - 1}" else s"fz${i - 1}"
      s"fz$i AS MATERIALIZED (SELECT *, (xyd_$i$t) / l_${i}_$i AS z_$i FROM $src)"
    }
    val bwd = (k - 1 to 0 by -1).map { i =>
      val t = (i + 1 until k).map(m => s" - l_${m}_$i * b_$m").mkString
      val src = if (i == k - 1) s"fz${k - 1}" else s"bw${i + 1}"
      s"bw$i AS MATERIALIZED (SELECT *, (z_$i$t) / l_${i}_$i AS b_$i FROM $src)"
    }
    val bdot = (0 until k).map(i => s"b_$i * xyd_$i").mkString(" + ")
    // per-row forward substitution, same nested shape as the engine's
    // Column build: v_i = (x_i − Σ_{m<i} l_im·v_m)/l_ii, h = Σ v_i²
    val vCols = (0 until k).map { i =>
      val t = (0 until i).map(m => s" - l_${i}_$m * v_$m").mkString
      s"(${xRef(i)}$t) / l_${i}_$i AS v_$i"
    }.mkString(",\n    ")
    val hExpr = (0 until k).map(i => s"v_$i * v_$i").mkString(" + ")
    val predExpr = (0 until k).map(i => s"b_$i * ${xRef(i)}").mkString(" + ")
    s"""WITH f0 AS MATERIALIZED (
       |  SELECT event_type, epoch_ns(ts) // 1800000000000 AS bucket_id,
       |    ${graft.queries.Grid.mean6Sql("value")} AS m
       |  FROM events GROUP BY 1, 2),
       |fp AS MATERIALIZED (
       |  SELECT bucket_id, ${px.mkString(",\n    ")}
       |  FROM f0 GROUP BY bucket_id),
       |ff AS MATERIALIZED (
       |  SELECT bucket_id, ${fill.mkString(",\n    ")}
       |  FROM fp),
       |fr AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT *, lead(click) OVER (ORDER BY bucket_id) AS y FROM ff) t
       |  WHERE y IS NOT NULL
       |    AND ${types.map(t => s"$t IS NOT NULL").mkString(" AND ")}),
       |m AS MATERIALIZED (
       |  SELECT count(*)::BIGINT AS n,
       |    ${(xxCols ++ xyCols).mkString(",\n    ")},
       |    sum(CAST(y * y AS DECIMAL(38,10))) AS yy
       |  FROM fr),
       |cv AS MATERIALIZED (
       |  SELECT n, ${aCols.mkString(",\n    ")}
       |  FROM m),
       |${(chol ++ fwd ++ bwd).mkString(",\n")},
       |sol AS MATERIALIZED (
       |  SELECT *, (yyd - ($bdot)) / (n - $k) AS s2 FROM bw0),
       |sc AS MATERIALIZED (
       |  SELECT fr.bucket_id, fr.y,
       |    $vCols,
       |    $predExpr AS pred,
       |    sol.s2 AS s2, sol.n AS n
       |  FROM fr CROSS JOIN sol),
       |sc2 AS MATERIALIZED (
       |  SELECT bucket_id, $hExpr AS h, y - pred AS resid, s2, n FROM sc),
       |sc3 AS MATERIALIZED (
       |  SELECT bucket_id, resid, h,
       |    (resid * resid * h) /
       |      ($k.0 * s2 * (1.0 - h) * (1.0 - h)) AS cook,
       |    n
       |  FROM sc2)
       |SELECT bucket_id, round(resid, 6) + 0.0 AS resid,
       |  round(h, 6) AS leverage, round(cook, 6) AS cooks_d,
       |  round(cook, 6) > round(4.0 / n, 6) AS influential
       |FROM sc3
       |ORDER BY cooks_d DESC, bucket_id ASC LIMIT 10""".stripMargin
  }

  /** DuckDB twin of `ml_isotonic` (r15): the same grid-6 fine frame as
    * [[influenceSql]] (f0/fp/ff/fr), then the minimax isotonic fit at
    * the O(k²) pair frame and the exact-decimal metric fold — every
    * block average one double division of exact prefix-sum differences,
    * every residual term 1e-9-gridded before the order-free DECIMAL
    * sum. */
  private def isotonicSql: String = {
    val types = ModelingFrame.EventTypes
    val px = types.map(t => s"max(CASE WHEN event_type = '$t' THEN m END) AS $t")
    val fill = types.map(t =>
      s"coalesce(last_value($t IGNORE NULLS) OVER (ORDER BY bucket_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        s"first_value($t IGNORE NULLS) OVER (ORDER BY bucket_id " +
        s"ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS $t")
    s"""WITH f0 AS MATERIALIZED (
       |  SELECT event_type, epoch_ns(ts) // 1800000000000 AS bucket_id,
       |    ${graft.queries.Grid.mean6Sql("value")} AS m
       |  FROM events GROUP BY 1, 2),
       |fp AS MATERIALIZED (
       |  SELECT bucket_id, ${px.mkString(",\n    ")}
       |  FROM f0 GROUP BY bucket_id),
       |ff AS MATERIALIZED (
       |  SELECT bucket_id, ${fill.mkString(",\n    ")}
       |  FROM fp),
       |fr AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT *, lead(click) OVER (ORDER BY bucket_id) AS y FROM ff) t
       |  WHERE y IS NOT NULL
       |    AND ${types.map(t => s"$t IS NOT NULL").mkString(" AND ")}),
       |pts AS MATERIALIZED (
       |  SELECT click AS x, count(*)::BIGINT AS w,
       |    sum(CAST(y AS DECIMAL(18,6))) AS sy
       |  FROM fr GROUP BY 1),
       |cum AS MATERIALIZED (
       |  SELECT x, w, sy,
       |    sum(w) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cw,
       |    sum(sy) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cs
       |  FROM pts),
       |pair AS MATERIALIZED (
       |  SELECT j.x AS jx, l.x AS lx,
       |    CAST(l.cs - (j.cs - j.sy) AS DOUBLE)
       |      / CAST(l.cw - (j.cw - j.w) AS DOUBLE) AS av
       |  FROM cum j JOIN cum l ON j.x <= l.x),
       |mn AS MATERIALIZED (
       |  SELECT jx, lx,
       |    min(av) OVER (PARTITION BY jx ORDER BY lx DESC
       |      ROWS UNBOUNDED PRECEDING) AS mn
       |  FROM pair),
       |fit AS MATERIALIZED (SELECT lx AS x, max(mn) AS yhat FROM mn GROUP BY 1),
       |blocks AS (
       |  SELECT sum(CASE WHEN prev IS NULL OR prev <> yhat THEN 1 ELSE 0 END)::BIGINT AS nb
       |  FROM (SELECT yhat, lag(yhat) OVER (ORDER BY x) AS prev FROM fit)),
       |sc AS (SELECT fr.y, fit.yhat FROM fr JOIN fit ON fit.x = fr.click),
       |mm AS (
       |  SELECT count(*)::BIGINT AS n,
       |    CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS syd,
       |    CAST(sum(CAST(CAST(y AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6)) AS DECIMAL(30,12))) AS DOUBLE) AS syyd,
       |    CAST(sum(CAST(round(abs(y - yhat), 9) AS DECIMAL(18,9))) AS DOUBLE) AS saed,
       |    CAST(sum(CAST(round((y - yhat) * (y - yhat), 9) AS DECIMAL(18,9))) AS DOUBLE) AS ssed
       |  FROM sc)
       |SELECT n, blocks.nb AS n_blocks,
       |  round(saed / n, 6) AS mae,
       |  round(sqrt(ssed / n), 6) AS rmse,
       |  round(1.0 - ssed / (syyd - syd * syd / n), 6) + 0.0 AS r2
       |FROM mm, blocks""".stripMargin
  }

  /** DuckDB twin of `ml_poisson_glm` (r15): the saturated one-hot
    * closed form — per-dow mean counts are exact BIGINT divisions,
    * coefficients are ln-ratios of identical doubles, deviance/AIC fold
    * over the (y, dow) contingency as exact DECIMAL sums of
    * 1e-9-gridded terms, ln-factorial is the ascending left-associated
    * `list_reduce` fold the engine's `foldLeft` mirrors. */
  private def poissonSql: String =
    """WITH cnt AS MATERIALIZED (
      |  SELECT user_id, day, CAST((day + 4) % 7 + 1 AS INT) AS dow,
      |    count(*)::BIGINT AS y
      |  FROM (SELECT user_id,
      |          date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
      |        FROM events)
      |  GROUP BY 1, 2, 3),
      |ct AS MATERIALIZED (
      |  SELECT dow, y, count(*)::BIGINT AS c FROM cnt GROUP BY 1, 2),
      |pd AS MATERIALIZED (
      |  SELECT dow, sum(c)::BIGINT AS nk, sum(c * y)::BIGINT AS sk,
      |    CAST(sum(c * y)::BIGINT AS DOUBLE) / sum(c)::BIGINT AS mu
      |  FROM ct GROUP BY dow),
      |tot AS (SELECT sum(nk)::BIGINT AS nt, sum(sk)::BIGINT AS st FROM pd),
      |m1 AS (SELECT mu AS mu1 FROM pd WHERE dow = 1),
      |dv AS (
      |  SELECT CAST(sum(CAST(round(y * ln(y / pd.mu) - (y - pd.mu), 9)
      |    AS DECIMAL(18,9)) * c) AS DOUBLE) AS devh
      |  FROM ct JOIN pd USING (dow)),
      |llc AS (
      |  SELECT CAST(sum(CAST(round(y * ln(mu) - mu - lf, 9)
      |    AS DECIMAL(18,9)) * c) AS DOUBLE) AS llh
      |  FROM (
      |    SELECT ct.y, ct.c, pd.mu,
      |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(generate_series(2, ct.y), i -> ln(i))),
      |        (a, b) -> a + b) AS lf
      |    FROM ct JOIN pd USING (dow)) q),
      |mf AS (
      |  SELECT CAST(sum(CAST(round(nk * mu, 9) AS DECIMAL(18,9))) AS DOUBLE) AS mfh
      |  FROM pd),
      |co AS (
      |  SELECT dow,
      |    CASE WHEN dow = 1 THEN ln(mu) ELSE ln(mu) - ln(m1.mu1) END AS cf
      |  FROM pd, m1)
      |SELECT * FROM (
      |  SELECT CASE WHEN dow = 1 THEN 'intercept' ELSE 'dow_' || dow END AS term,
      |    round(cf, 6) + 0.0 AS estimate,
      |    round(exp(cf), 6) + 0.0 AS rate_ratio
      |  FROM co
      |  UNION ALL
      |  SELECT 'deviance', round(2.0 * devh, 6) + 0.0, NULL FROM dv
      |  UNION ALL
      |  SELECT 'aic', round(14.0 - 2.0 * llh, 6) + 0.0, NULL FROM llc
      |  UNION ALL
      |  SELECT 'n_obs', CAST(nt AS DOUBLE), NULL FROM tot
      |  UNION ALL
      |  SELECT 'mean_observed', round(CAST(st AS DOUBLE) / nt, 6) + 0.0, NULL FROM tot
      |  UNION ALL
      |  SELECT 'mean_fitted', round(mfh / nt, 6) + 0.0, NULL FROM mf, tot)
      |ORDER BY term""".stripMargin

  /** DuckDB twin of `ml_huber` (r15): the same grid-6 fine frame, the
    * OLS start through the influence-oracle moment/Cholesky chain, the
    * MAD-consistent scale as one quantile, then FOUR weighted-solve
    * chains — every fold left-associated ascending-index, the Huber
    * weight a CASE whose two branches are continuous at the switch. */
  /** DuckDB twin of `ml_huber` — every piece (fine-frame prelude,
    * DECIMAL moments, shared-order Cholesky chain, the Huber weight,
    * the tuning constants, the step count) is GENERATED from
    * [[IrlsCore]], the same object the engine's driver replay reads
    * (VERDICT r15 #5). */
  private def huberSql: String = {
    val types = ModelingFrame.EventTypes
    val p = types.length + 1
    def predExpr(alias: String) = IrlsCore.predExprCols(types, alias)
    val (olsXX, olsXY) = IrlsCore.olsMomentsSql(types)
    val olsA = IrlsCore.momentsToDoubleSql(p)
    def iterMoments(t: Int, prev: String): String = {
      val (aa, gg) = IrlsCore.weightedMomentsSql(types)
      s"""hm$t AS (
         |  SELECT
         |    $aa,
         |    $gg
         |  FROM (
         |    SELECT fr.*,
         |      ${IrlsCore.huberWeightSql(predExpr("sp"), "cc.c")} AS w
         |    FROM fr, $prev sp, cc) q),
         |ha$t AS MATERIALIZED (
         |  SELECT
         |    $olsA
         |  FROM hm$t),
         |${IrlsCore.cholCtes(s"h$t", s"ha$t", p)},
         |hs$t AS MATERIALIZED (
         |  SELECT ${(0 until p).map(i => s"b_$i").mkString(", ")} FROM h${t}w0)""".stripMargin
    }
    val coefSel = (0 until p).map { i =>
      val nm = if (i == 0) "__intercept" else types(i - 1)
      s"SELECT '$nm' AS feature, round(hb.b_$i, 6) + 0.0 AS huber, " +
        s"round(ob.b_$i, 6) + 0.0 AS ols FROM solH hb, sol0 ob"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${IrlsCore.finePrelude(types)},
       |m0 AS (
       |  SELECT
       |    $olsXX,
       |    $olsXY
       |  FROM fr),
       |a0 AS MATERIALIZED (
       |  SELECT
       |    $olsA
       |  FROM m0),
       |${IrlsCore.cholCtes("s0", "a0", p)},
       |sol0 AS MATERIALIZED (SELECT ${(0 until p).map(i => s"b_$i").mkString(", ")} FROM s0w0),
       |cc AS MATERIALIZED (
       |  SELECT ${IrlsCore.HuberTuning} * (quantile_cont(abs(y - (${predExpr("sp")})), 0.5) / ${IrlsCore.MadConsistency}) AS c
       |  FROM fr, sol0 sp),
       |${(1 to IrlsCore.HuberSteps).map(t =>
            iterMoments(t, if (t == 1) "sol0" else s"hs${t - 1}"))
          .mkString(",\n")},
       |solH AS MATERIALIZED (SELECT * FROM hs${IrlsCore.HuberSteps}),
       |mm AS (
       |  SELECT count(*)::BIGINT AS n,
       |    CAST(sum(CAST(round(abs(y - (${predExpr("hb")})), 9) AS DECIMAL(22,9))) AS DOUBLE) AS sah,
       |    CAST(sum(CAST(round(abs(y - (${predExpr("ob")})), 9) AS DECIMAL(22,9))) AS DOUBLE) AS sao
       |  FROM fr, solH hb, sol0 ob)
       |SELECT * FROM (
       |  $coefSel
       |  UNION ALL
       |  SELECT '__mae', round(sah / n, 6) + 0.0, round(sao / n, 6) + 0.0 FROM mm)
       |ORDER BY feature""".stripMargin
  }

  /** DuckDB twin of `ml_quantile_regression` (r16) — the huber chain
    * with the EXPECTILE weight, but the iteration ladder rides ONE
    * recursive CTE instead of unrolled per-step chains: all three τ
    * advance together as rows (the `ml_holt_winters` grid-dimension
    * precedent), the β vector rides a LIST column, each step's moments
    * are ONE exact-DECIMAL aggregate over `fr` (a LATERAL with GROUP
    * BY — order-free), and the 6×6 Cholesky solve is the SAME fold
    * order as [[IrlsCore.solve]], generated once as chained LATERALs
    * ([[IrlsCore.cholLaterals]]) — so 12 steps × 3 τ cost one chain of
    * text and 36 scans of the 1.4k-row frame. The recalibration CTE
    * replays Spark's percentile interpolation EXPRESSION
    * ([[IrlsCore.pctAtSql]]) over the sorted residual list; coverage
    * compares RAW doubles (bit-identical predictors ⇒ no rounding
    * ties); pinball replays the huber MAE decimal-sum discipline. */
  private def quantileSql: String = {
    val types = ModelingFrame.EventTypes
    val p = types.length + 1
    val (olsXX, olsXY) = IrlsCore.olsMomentsSql(types)
    val olsA = IrlsCore.momentsToDoubleSql(p)
    val (mmXX, mmXY) = IrlsCore.weightedMomentsSql(types)
    val predQ = IrlsCore.predExprList(types, "q")
    val predF = IrlsCore.predExprList(types, "s")
    val predCal = s"($predF) + d.delta"
    val tauList = IrlsCore.QuantileTaus
      .map(t => s"CAST(${java.lang.Double.toString(t)} AS DOUBLE)")
      .mkString(", ")
    s"""WITH RECURSIVE ${IrlsCore.finePrelude(types)},
       |m0 AS (
       |  SELECT
       |    $olsXX,
       |    $olsXY
       |  FROM fr),
       |a0 AS MATERIALIZED (
       |  SELECT
       |    $olsA
       |  FROM m0),
       |${IrlsCore.cholCtes("s0", "a0", p)},
       |sol0 AS MATERIALIZED (
       |  SELECT [${(0 until p).map(i => s"b_$i").mkString(", ")}] AS bl FROM s0w0),
       |taus AS (SELECT unnest([$tauList]) AS tau),
       |qreg(tau, it, bl) AS (
       |  SELECT taus.tau, 0, sol0.bl FROM taus, sol0
       |  UNION ALL
       |  SELECT q.tau, q.it + 1, [${(0 until p).map(i => s"cw$i.b_$i").mkString(", ")}]
       |  FROM (SELECT * FROM qreg WHERE it < ${IrlsCore.QuantileSteps}) q,
       |    LATERAL (
       |      SELECT
       |        $olsA
       |      FROM (
       |        SELECT
       |          $mmXX,
       |          $mmXY
       |        FROM (SELECT fr.*,
       |          ${IrlsCore.expectileWeightSql(predQ, "q.tau")} AS w
       |          FROM fr) wf) m1) mm,
       |    ${IrlsCore.cholLaterals(p)}
       |),
       |fin AS MATERIALIZED (
       |  SELECT tau, bl FROM qreg WHERE it = ${IrlsCore.QuantileSteps}),
       |ecal AS MATERIALIZED (
       |  SELECT s.tau, list_sort(list(y - ($predF))) AS el, count(*)::BIGINT AS n
       |  FROM fr, fin s GROUP BY s.tau),
       |dcal AS MATERIALIZED (
       |  SELECT tau, ${IrlsCore.pctAtSql} AS delta FROM (
       |    SELECT tau, el, n, tau * (n - 1) AS pos,
       |      CAST(floor(tau * (n - 1)) AS INT) AS lo,
       |      CAST(ceil(tau * (n - 1)) AS INT) AS hi
       |    FROM ecal) t),
       |met AS (
       |  SELECT s.tau,
       |    avg(CASE WHEN y <= ($predCal) THEN 1.0 ELSE 0.0 END) AS cov,
       |    count(*)::BIGINT AS n,
       |    CAST(sum(CAST(round(CASE WHEN y >= ($predCal) THEN s.tau * (y - ($predCal))
       |      ELSE (1.0 - s.tau) * (($predCal) - y) END, 9) AS DECIMAL(22,9))) AS DOUBLE) AS spb
       |  FROM fr, fin s, dcal d WHERE d.tau = s.tau GROUP BY s.tau)
       |SELECT m.tau AS tau, round(s.bl[1] + d.delta, 6) + 0.0 AS intercept,
       |  round(m.cov, 6) + 0.0 AS coverage, round(m.spb / m.n, 6) + 0.0 AS pinball
       |FROM met m JOIN fin s ON s.tau = m.tau JOIN dcal d ON d.tau = m.tau
       |ORDER BY tau""".stripMargin
  }

  /** DuckDB twin of `ml_pca` (r16) — exact DECIMAL covariance moments
    * over the fine frame, the 1e-9-grid covariance as a list-of-lists,
    * then FIVE chained 150-step single-row-state power recursions with
    * rank-1 grid deflation between them (the `pcaPowerSql` machinery
    * at general k), sklearn largest-|loading| sign decided on grid
    * values (list_position ↔ maxBy: both first-index on ties). */
  private def pcaSql: String = {
    val types = ModelingFrame.EventTypes
    val k = types.length
    val sums = types.zipWithIndex.map { case (v, i) =>
      s"CAST(sum(CAST($v AS DECIMAL(18,6))) AS DOUBLE) AS s_$i" }.mkString(",\n    ")
    val prods = (for (i <- types.indices; j <- i until k) yield
      s"CAST(sum(CAST(CAST(${types(i)} AS DECIMAL(18,6)) * CAST(${types(j)} AS DECIMAL(18,6)) AS DECIMAL(30,12))) AS DOUBLE) AS p_${i}_$j")
      .mkString(",\n    ")
    def pRef(i: Int, j: Int) = s"p_${math.min(i, j)}_${math.max(i, j)}"
    val cvRows = (0 until k).map { i =>
      (0 until k).map(j =>
        s"round((${pRef(i, j)} - s_$i * s_$j / n) / (n - 1), 9) + 0.0")
        .mkString("[", ", ", "]")
    }.mkString("[\n      ", ",\n      ", "]")
    def pw(name: String, mat: String) =
      s"""$name(i, v) AS (
         |  SELECT 0, [${Seq.fill(k)("v0").mkString(", ")}] FROM r0
         |  UNION ALL
         |  SELECT i + 1, list_transform(generate_series(1, $k), g ->
         |    round(w[g] / nrm, 9) + 0.0)
         |  FROM (
         |    SELECT i, w,
         |      sqrt(list_reduce(list_transform(generate_series(1, $k), g ->
         |        w[g] * w[g]), (a, b) -> a + b)) AS nrm
         |    FROM (
         |      SELECT rec.i AS i,
         |        list_transform(generate_series(1, $k), g ->
         |          list_reduce(list_transform(generate_series(1, $k), j ->
         |            m.rm[g][j] * rec.v[j]), (a, b) -> a + b)) AS w
         |      FROM $name rec, $mat m) t0) t1
         |  WHERE i < 150)""".stripMargin
    def signFix(src: String, out: String) =
      s"""$out AS MATERIALIZED (SELECT CASE WHEN v[list_position(
         |    list_transform(v, x -> abs(x)),
         |    list_max(list_transform(v, x -> abs(x))))] < 0
         |  THEN list_transform(v, x -> -x + 0.0) ELSE v END AS v FROM $src)""".stripMargin
    def rayleigh(vsrc: String, mat: String, out: String) =
      s"""$out AS MATERIALIZED (SELECT round(list_reduce(list_transform(generate_series(1, $k), g ->
         |    s.v[g] * list_reduce(list_transform(generate_series(1, $k), j ->
         |      m.rm[g][j] * s.v[j]), (a, b) -> a + b)), (a, b) -> a + b), 9) AS lam
         |  FROM $vsrc s, $mat m)""".stripMargin
    def deflate(matIn: String, lsrc: String, vsrc: String, out: String) =
      s"""$out AS MATERIALIZED (
         |  SELECT list_transform(generate_series(1, $k), i ->
         |    list_transform(generate_series(1, $k), j ->
         |      round(m.rm[i][j] - l.lam * s.v[i] * s.v[j], 9) + 0.0)) AS rm
         |  FROM $matIn m, $lsrc l, $vsrc s)""".stripMargin
    val nmVals = types.zipWithIndex
      .map { case (t, i) => s"(${i + 1}, '$t')" }.mkString(", ")
    def outArm(c: Int) =
      s"""SELECT $c AS component, nm.f AS feature,
         |    round(s.v[nm.i], 6) + 0.0 AS loading,
         |    round(l.lam, 6) + 0.0 AS eigenvalue,
         |    round(l.lam / t.tr, 6) + 0.0 AS explained_ratio
         |  FROM sv$c s, l$c l, trc t, (VALUES $nmVals) nm(i, f)""".stripMargin
    val comps = (1 to k).map { c =>
      val mat = if (c == 1) "cv" else s"dm$c"
      val defl = if (c < k)
        ",\n" + deflate(mat, s"l$c", s"sv$c", s"dm${c + 1}") else ""
      s"""${pw(s"pw$c", mat)},
         |vf$c AS MATERIALIZED (SELECT v FROM pw$c WHERE i = 150),
         |${signFix(s"vf$c", s"sv$c")},
         |${rayleigh(s"sv$c", mat, s"l$c")}$defl""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE ${IrlsCore.finePrelude(types)},
       |mo AS (
       |  SELECT count(*)::BIGINT AS n,
       |    $sums,
       |    $prods
       |  FROM fr),
       |cv AS MATERIALIZED (
       |  SELECT
       |    $cvRows AS rm
       |  FROM mo),
       |r0 AS MATERIALIZED (SELECT round(1.0 / sqrt(${k.toDouble}), 9) AS v0 FROM cv),
       |$comps,
       |trc AS MATERIALIZED (SELECT round(list_reduce(list_transform(generate_series(1, $k), g ->
       |    m.rm[g][g]), (a, b) -> a + b), 9) AS tr FROM cv m)
       |SELECT component, feature, loading, eigenvalue, explained_ratio
       |FROM (
       |  ${(1 to k).map(outArm).mkString("\n  UNION ALL\n  ")})
       |ORDER BY component, feature""".stripMargin
  }

  /** DuckDB twin of `ml_garch` (r16) — the gridded Nelder–Mead as a
    * simplex-carrying recursive CTE. Every piece replays
    * `Garch.fitGridded` exactly: the 1e-9-gridded log-returns, the
    * t-ordered sum/sumsq folds, the σ² recursion as an index-ordered
    * `list_reduce` whose state CARRIES the (ω, α, β) params (DuckDB 1.0
    * lambda bodies inside a LATERAL cannot capture correlated columns —
    * params ride the fold's initial element instead), the 1e-6-gridded
    * objective with the 1e18 infeasibility sentinel, the stable
    * (value, index) vertex sort via `list_sort` over (f, pos, th)
    * structs, the reflect/expand/contract/shrink CASE in the engine's
    * exact branch order, and the spread-0 stop. Fractional literals
    * that are NOT exactly representable are written in e-notation so
    * DuckDB parses them as DOUBLE (its plain `0.05` is DECIMAL, and
    * `1 - 0.05 - 0.90` evaluated in decimal is 0.05 exactly — NOT the
    * engine's 0.04999999999999993 double chain). */
  private def garchSql: String = {
    // capture-free likelihood fold: state [s2, acc, r_prev, w, a, b]
    def foldExpr(w: String, a: String, b: String): String = {
      val s2p = "(acc[4] + acc[5] * acc[3] * acc[3] + acc[6] * acc[1])"
      "list_reduce(list_prepend(" +
        s"[sv.v, ln(sv.v) + sv.rl[1] * sv.rl[1] / sv.v, sv.rl[1], $w, $a, $b], " +
        "list_transform(sv.rl[2:], x -> [x])), " +
        s"(acc, x) -> [$s2p, acc[2] + ln$s2p + x[1] * x[1] / $s2p, x[1], acc[4], acc[5], acc[6]])"
    }
    def evalLats(cand: String, tag: String): String = {
      val (w, a, b) = (s"exp($cand[1])", s"exp($cand[2])", s"exp($cand[3])")
      s"LATERAL (SELECT ${foldExpr(w, a, b)} AS st) fs$tag,\n" +
        s"    LATERAL (SELECT CASE WHEN NOT ($w > 0) OR $a + $b >= 1.0 THEN 1e18 " +
        s"WHEN NOT isfinite(0.5 * fs$tag.st[2] + 0.5 * sv.n * ln(2 * pi())) THEN 1e18 " +
        s"ELSE round(0.5 * fs$tag.st[2] + 0.5 * sv.n * ln(2 * pi()), 6) END AS f) e$tag"
    }
    val cen = "list_transform(list_zip(srt.sl[1].th, srt.sl[2].th, srt.sl[3].th), " +
      "p -> round((p[1] + p[2] + p[3]) / 3, 9))"
    def at(c: String) =
      s"list_transform(list_zip(cc.cl, srt.sl[4].th), p -> round(p[1] + $c * (p[1] - p[2]), 9))"
    def shr(i: Int) =
      s"list_transform(list_zip(srt.sl[1].th, srt.sl[$i].th), p -> round(p[1] + 0.5 * (p[2] - p[1]), 9))"
    def keep(i: Int) = s"{'f': srt.sl[$i].f, 'th': srt.sl[$i].th}"
    def objOf(th: String) =
      s"CASE WHEN NOT (exp($th[1]) > 0) OR exp($th[2]) + exp($th[3]) >= 1.0 THEN 1e18 " +
        s"WHEN NOT isfinite(0.5 * ${foldExpr(s"exp($th[1])", s"exp($th[2])", s"exp($th[3])")}[2] + 0.5 * sv.n * ln(2 * pi())) THEN 1e18 " +
        s"ELSE round(0.5 * ${foldExpr(s"exp($th[1])", s"exp($th[2])", s"exp($th[3])")}[2] + 0.5 * sv.n * ln(2 * pi()), 6) END"
    s"""WITH RECURSIVE b AS MATERIALIZED (
       |  SELECT epoch_ns(ts) // 1800000000000 AS bucket, ${Grid.mean6Sql("value")} AS px
       |  FROM events WHERE event_type = 'click' GROUP BY 1),
       |l1 AS MATERIALIZED (
       |  SELECT bucket, lr FROM (
       |    SELECT bucket, round(ln(px / lag(px) OVER (ORDER BY bucket)), 9) AS lr FROM b)
       |  WHERE lr IS NOT NULL),
       |rv AS MATERIALIZED (
       |  SELECT n, list_transform(rl0, x -> x - mu) AS rl FROM (
       |    SELECT rl0, n, list_reduce(rl0, (a, x) -> a + x) / n AS mu FROM (
       |      SELECT list(lr ORDER BY bucket) AS rl0, count(*)::BIGINT AS n FROM l1))),
       |sv AS MATERIALIZED (
       |  SELECT rl, n,
       |    (list_reduce(list_transform(rl, x -> x * x), (a, x) -> a + x)
       |      - list_reduce(rl, (a, x) -> a + x) * list_reduce(rl, (a, x) -> a + x) / n) / n AS v
       |  FROM rv),
       |st0 AS MATERIALIZED (
       |  SELECT [round(ln((1.0 - 5e-2 - 9e-1) * v), 9), round(ln(5e-2), 9), round(ln(9e-1), 9)] AS th
       |  FROM sv),
       |sx0 AS MATERIALIZED (
       |  SELECT list_transform(generate_series(0, 3), i ->
       |    CASE WHEN i = 0 THEN st0.th
       |         ELSE list_transform(list_zip(st0.th, [1, 2, 3]), p ->
       |           CASE WHEN p[2] = i THEN round(p[1] + 0.5, 9) ELSE p[1] END) END) AS ths
       |  FROM st0),
       |sx1 AS MATERIALIZED (
       |  SELECT list_transform(sx0.ths, th ->
       |    {'f': ${objOf("th")},
       |     'th': th}) AS sx
       |  FROM sx0, sv),
       |nm(it, sx) AS (
       |  SELECT 0, sx FROM sx1
       |  UNION ALL
       |  SELECT q.it + 1,
       |    CASE
       |      WHEN er.f < srt.sl[1].f THEN
       |        CASE WHEN ee.f < er.f
       |          THEN [${keep(1)}, ${keep(2)}, ${keep(3)}, {'f': ee.f, 'th': pts.xe}]
       |          ELSE [${keep(1)}, ${keep(2)}, ${keep(3)}, {'f': er.f, 'th': pts.xr}] END
       |      WHEN er.f < srt.sl[3].f
       |        THEN [${keep(1)}, ${keep(2)}, ${keep(3)}, {'f': er.f, 'th': pts.xr}]
       |      WHEN ec.f < srt.sl[4].f
       |        THEN [${keep(1)}, ${keep(2)}, ${keep(3)}, {'f': ec.f, 'th': pts.xc}]
       |      ELSE [${keep(1)},
       |        {'f': es2.f, 'th': pts.p2}, {'f': es3.f, 'th': pts.p3}, {'f': es4.f, 'th': pts.p4}]
       |    END
       |  FROM (SELECT * FROM nm
       |        WHERE it < 600
       |          AND list_max(list_transform(sx, s -> s.f))
       |            - list_min(list_transform(sx, s -> s.f)) > 0.0) q,
       |    sv,
       |    LATERAL (SELECT list_sort(list_transform(list_zip(q.sx, [1, 2, 3, 4]), p ->
       |      {'f': p[1].f, 'pos': p[2], 'th': p[1].th})) AS sl) srt,
       |    LATERAL (SELECT $cen AS cl) cc,
       |    LATERAL (SELECT ${at("1.0")} AS xr, ${at("2.0")} AS xe, ${at("(-0.5)")} AS xc,
       |      ${shr(2)} AS p2, ${shr(3)} AS p3, ${shr(4)} AS p4) pts,
       |    ${evalLats("pts.xr", "r")},
       |    ${evalLats("pts.xe", "e")},
       |    ${evalLats("pts.xc", "c")},
       |    ${evalLats("pts.p2", "s2")},
       |    ${evalLats("pts.p3", "s3")},
       |    ${evalLats("pts.p4", "s4")}
       |),
       |fin AS MATERIALIZED (SELECT sx FROM nm ORDER BY it DESC LIMIT 1),
       |bst AS MATERIALIZED (
       |  SELECT list_sort(list_transform(list_zip(fin.sx, [1, 2, 3, 4]), p ->
       |    {'f': p[1].f, 'pos': p[2], 'th': p[1].th}))[1].th AS th
       |  FROM fin),
       |prm AS MATERIALIZED (
       |  SELECT exp(th[1]) AS w, exp(th[2]) AS a, exp(th[3]) AS b, th FROM bst),
       |llv AS MATERIALIZED (
       |  SELECT -(0.5 * ${foldExpr("prm.w", "prm.a", "prm.b")}[2] + 0.5 * sv.n * ln(2 * pi())) AS ll,
       |    prm.w, prm.a, prm.b
       |  FROM prm, sv)
       |SELECT sv.n AS n,
       |  round(llv.w * 1e6, 6) + 0.0 AS omega_x1e6,
       |  round(llv.a, 6) + 0.0 AS alpha,
       |  round(llv.b, 6) + 0.0 AS beta,
       |  round(llv.a + llv.b, 6) + 0.0 AS persistence,
       |  round(llv.w / (1.0 - llv.a - llv.b) * 1e6, 6) + 0.0 AS uncond_var_x1e6,
       |  round(llv.ll, 6) + 0.0 AS loglik,
       |  round(-2.0 * llv.ll + 2.0 * 3, 6) + 0.0 AS aic
       |FROM llv, sv""".stripMargin
  }

  val sql: Map[String, String] = Map(

    "ml_isotonic" -> isotonicSql,

    "ml_huber" -> huberSql,

    "ml_quantile_regression" -> quantileSql,

    "ml_pca" -> pcaSql,

    "ml_garch" -> garchSql,

    "ml_poisson_glm" -> poissonSql,

    "ml_influence_diagnostics" -> influenceSql,
    "ml_ridge" -> coefSql(1.0),

    "ml_sarima" -> sarimaSql,

    "ml_sarima_hybrid" -> hybridSql,

    "ml_shap" -> shapSql,

    "ml_walk_forward" -> walkForwardSql,

    "ml_conformal_interval" -> conformalSql,

    /** Distributed sample ACF — identical window/sum ladder. */
    "ml_acf" -> {
      val maxLag = 10
      val arms = (1 to maxLag).map(k =>
        s"SELECT $k AS lag, round(round(CAST(num$k AS DOUBLE)/CAST(den AS DOUBLE), 9), 6) + 0.0 AS acf FROM a")
        .mkString("\n  UNION ALL ")
      s"""WITH ${acfMomentsSql(maxLag)}
         |SELECT lag, acf FROM (
         |  $arms)
         |ORDER BY lag""".stripMargin
    },

    /** Durbin–Levinson as a recursive CTE: the φ vector rides a LIST
      * column, the inner Σφⱼr_{k−j} is an index-ORDERED list_reduce fold
      * (never an engine-order aggregate), and every state re-rounds to
      * the 1e-9 grid — the exact arithmetic the driver loop replays. */
    "ml_pacf" -> {
      val maxLag = 10
      val arms = (1 to maxLag).map(k =>
        s"SELECT $k AS lag, round(CAST(num$k AS DOUBLE)/CAST(den AS DOUBLE), 9) AS acf9 FROM a")
        .mkString("\n  UNION ALL ")
      s"""WITH RECURSIVE ${acfMomentsSql(maxLag)},
         |rv AS (
         |  $arms),
         |r AS (SELECT list_prepend(CAST(1.0 AS DOUBLE), list(acf9 ORDER BY lag)) AS rl FROM rv),
         |dl(k, v, phi) AS (
         |  SELECT 1, round(1.0 - rl[2]*rl[2], 9), [rl[2]] FROM r
         |  UNION ALL
         |  SELECT k + 1,
         |    round(v * (1.0 - pk*pk), 9),
         |    list_append(list_transform(generate_series(1, k),
         |      j -> round(phi[j] - pk*phi[k+1-j], 9)), pk)
         |  FROM (
         |    SELECT k, v, phi, rl,
         |      round((rl[k+2] - list_reduce(list_transform(generate_series(1, k),
         |        j -> phi[j]*rl[k+2-j]), (a, b) -> a + b)) / v, 9) AS pk
         |    FROM dl, r) t
         |  WHERE k < $maxLag)
         |SELECT k AS lag, round(rl[k+1], 6) + 0.0 AS acf, round(phi[k], 6) + 0.0 AS pacf
         |FROM dl, r ORDER BY lag""".stripMargin
    },

    "ml_gridsearch" -> gridSearchSql,

    /** In-engine augmented Dickey-Fuller, oracle-checked: the constant
      * term is eliminated by CENTERING the three regressors (slope
      * estimates and their variances are unchanged — standard regression
      * identity), which turns the 4×4 normal equations into a 3×3
      * centered-Gram system DuckDB solves by Cramer; the t-stat needs
      * one cofactor ([S⁻¹]₁₁ = (c22·c33 − c23²)/det) and
      * s² = SSR/(n−4). Verifies the GroupedOlsStats Aggregator — betas,
      * Gram inverse AND residual variance — end-to-end. */
    /** Product-limit replay: identical risk-set windows and the same
      * exp-sum-ln cumulative accumulation in t-order. */
    "ml_survival_km" ->
      """WITH life AS (
        |  SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS first_day,
        |    max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS last_day
        |  FROM events GROUP BY user_id),
        |bounds AS (SELECT max(last_day) AS span_end, count(*) AS n_users FROM life),
        |obs AS (
        |  SELECT n_users, last_day - first_day AS t,
        |    CASE WHEN last_day <= span_end - 7 THEN 1 ELSE 0 END AS e
        |  FROM life, bounds),
        |byt AS (
        |  SELECT t, max(n_users) AS n_users, count(*) AS n_at_t,
        |    sum(e)::BIGINT AS d_events,
        |    (count(*) - sum(e))::BIGINT AS c_censored
        |  FROM obs GROUP BY t),
        |rk AS (
        |  SELECT *,
        |    n_users - coalesce(sum(n_at_t) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM byt),
        |ln AS (
        |  SELECT *,
        |    CASE WHEN d_events > 0 THEN ln(1.0 - d_events / n_risk) ELSE 0.0 END AS lnterm
        |  FROM rk)
        |SELECT t AS lifetime_days, n_risk::BIGINT AS n_risk, d_events, c_censored,
        |  round(exp(sum(lnterm) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS survival
        |FROM ln ORDER BY lifetime_days""".stripMargin,

    "stationarity_test_adf" ->
      """WITH daily AS (
        |  SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |         avg(value) AS x
        |  FROM events GROUP BY event_type, day),
        |d1 AS (SELECT event_type, day, x,
        |         lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1
        |       FROM daily),
        |d2 AS (SELECT *, x - x1 AS dx FROM d1),
        |d3 AS (SELECT *,
        |         lag(dx, 1) OVER (PARTITION BY event_type ORDER BY day) AS dx1,
        |         lag(dx, 2) OVER (PARTITION BY event_type ORDER BY day) AS dx2
        |       FROM d2),
        |r AS (SELECT event_type, x1, dx1, dx2, dx AS y FROM d3
        |      WHERE x1 IS NOT NULL AND dx IS NOT NULL
        |        AND dx1 IS NOT NULL AND dx2 IS NOT NULL),
        |g AS (SELECT event_type, count(*)::DOUBLE AS n,
        |        avg(x1) AS a1, avg(dx1) AS a2, avg(dx2) AS a3, avg(y) AS ay,
        |        sum(x1*x1) AS s11, sum(x1*dx1) AS s12, sum(x1*dx2) AS s13,
        |        sum(dx1*dx1) AS s22, sum(dx1*dx2) AS s23, sum(dx2*dx2) AS s33,
        |        sum(x1*y) AS sy1, sum(dx1*y) AS sy2, sum(dx2*y) AS sy3,
        |        sum(y*y) AS syy
        |      FROM r GROUP BY event_type),
        |cg AS (SELECT event_type, n,
        |        s11 - n*a1*a1 AS c11, s12 - n*a1*a2 AS c12, s13 - n*a1*a3 AS c13,
        |        s22 - n*a2*a2 AS c22, s23 - n*a2*a3 AS c23, s33 - n*a3*a3 AS c33,
        |        sy1 - n*a1*ay AS cy1, sy2 - n*a2*ay AS cy2, sy3 - n*a3*ay AS cy3,
        |        syy - n*ay*ay AS cyy
        |      FROM g),
        |sol AS (SELECT event_type, n, cyy, cy1, cy2, cy3, c22, c33, c23,
        |        c11*(c22*c33 - c23*c23) - c12*(c12*c33 - c23*c13) + c13*(c12*c23 - c22*c13) AS det,
        |        cy1*(c22*c33 - c23*c23) - c12*(cy2*c33 - c23*cy3) + c13*(cy2*c23 - c22*cy3) AS det1,
        |        c11*(cy2*c33 - cy3*c23) - cy1*(c12*c33 - c23*c13) + c13*(c12*cy3 - cy2*c13) AS det2,
        |        c11*(c22*cy3 - c23*cy2) - c12*(c12*cy3 - cy2*c13) + cy1*(c12*c23 - c22*c13) AS det3
        |      FROM cg),
        |fin AS (SELECT event_type, n,
        |        det1/det AS b1,
        |        (cyy - (det1/det)*cy1 - (det2/det)*cy2 - (det3/det)*cy3) / (n - 4) AS s2,
        |        (c22*c33 - c23*c23) / det AS inv11
        |      FROM sol)
        |SELECT event_type, n::BIGINT AS n, round(b1, 6) AS beta_level,
        |  round(b1 / sqrt(s2 * inv11), 4) AS adf_tstat
        |FROM fin ORDER BY event_type""".stripMargin,

    /** AR(3) baseline, oracle-checked by the same centered 3×3 Cramer
      * closed form; the 1-step forecast re-reads the latest row's
      * (click, lag1, lag2) as the new lags, exactly like the engine. */
    "ml_ar_forecast" -> (Pipe.dailySql +
      """, lagged AS (
        |  SELECT date_id, click,
        |    lag(click, 1) OVER (ORDER BY date_id) AS l1,
        |    lag(click, 2) OVER (ORDER BY date_id) AS l2,
        |    lag(click, 3) OVER (ORDER BY date_id) AS l3
        |  FROM daily),
        |r AS (SELECT * FROM lagged
        |      WHERE click IS NOT NULL AND l1 IS NOT NULL
        |        AND l2 IS NOT NULL AND l3 IS NOT NULL),
        |g AS (SELECT count(*)::DOUBLE AS n,
        |        avg(l1) AS a1, avg(l2) AS a2, avg(l3) AS a3, avg(click) AS ay,
        |        sum(l1*l1) AS s11, sum(l1*l2) AS s12, sum(l1*l3) AS s13,
        |        sum(l2*l2) AS s22, sum(l2*l3) AS s23, sum(l3*l3) AS s33,
        |        sum(l1*click) AS sy1, sum(l2*click) AS sy2, sum(l3*click) AS sy3,
        |        sum(click*click) AS syy
        |      FROM r),
        |cg AS (SELECT n, a1, a2, a3, ay,
        |        s11 - n*a1*a1 AS c11, s12 - n*a1*a2 AS c12, s13 - n*a1*a3 AS c13,
        |        s22 - n*a2*a2 AS c22, s23 - n*a2*a3 AS c23, s33 - n*a3*a3 AS c33,
        |        sy1 - n*a1*ay AS cy1, sy2 - n*a2*ay AS cy2, sy3 - n*a3*ay AS cy3,
        |        syy - n*ay*ay AS cyy
        |      FROM g),
        |sol AS (SELECT *,
        |        c11*(c22*c33 - c23*c23) - c12*(c12*c33 - c23*c13) + c13*(c12*c23 - c22*c13) AS det,
        |        cy1*(c22*c33 - c23*c23) - c12*(cy2*c33 - c23*cy3) + c13*(cy2*c23 - c22*cy3) AS det1,
        |        c11*(cy2*c33 - cy3*c23) - cy1*(c12*c33 - c23*c13) + c13*(c12*cy3 - cy2*c13) AS det2,
        |        c11*(c22*cy3 - c23*cy2) - c12*(c12*cy3 - cy2*c13) + cy1*(c12*c23 - c22*c13) AS det3
        |      FROM cg),
        |fit AS (SELECT n, cyy, cy1, cy2, cy3,
        |        det1/det AS b1, det2/det AS b2, det3/det AS b3,
        |        ay - (det1/det)*a1 - (det2/det)*a2 - (det3/det)*a3 AS b0
        |      FROM sol),
        |latest AS (SELECT click, l1, l2 FROM r ORDER BY date_id DESC LIMIT 1)
        |SELECT round(b0 + b1*latest.click + b2*latest.l1 + b3*latest.l2, 6) AS forecast_next,
        |  round(1.0 - (cyy - b1*cy1 - b2*cy2 - b3*cy3) / cyy, 6) AS train_r2
        |FROM fit, latest""".stripMargin),

    /** Multi-feature OLS is not a DuckDB builtin, but the quadratic-trend
      * fit IS SQL-expressible as a closed form: accumulate the Gram /
      * moment sums per group and solve the 3×3 normal equations with
      * Cramer's rule — verifying the custom Aggregator end-to-end. */
    "ml_trend_per_series" ->
      """WITH e AS (
        |  SELECT event_type,
        |    (datediff('day', DATE '1970-01-01', ts::DATE)
        |      - (SELECT min(datediff('day', DATE '1970-01-01', ts::DATE)) FROM events)) / 100.0 AS t,
        |    value::DOUBLE AS y
        |  FROM events),
        |g AS (
        |  SELECT event_type, count(*)::DOUBLE AS s0, sum(t) AS s1, sum(t*t) AS s2,
        |    sum(t*t*t) AS s3, sum(t*t*t*t) AS s4,
        |    sum(y) AS sy, sum(t*y) AS sty, sum(t*t*y) AS st2y
        |  FROM e GROUP BY event_type),
        |c AS (
        |  SELECT event_type,
        |    s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2) AS det,
        |    sy*(s2*s4 - s3*s3) - s1*(sty*s4 - st2y*s3) + s2*(sty*s3 - st2y*s2) AS det0,
        |    s0*(sty*s4 - st2y*s3) - sy*(s1*s4 - s3*s2) + s2*(s1*st2y - sty*s2) AS det1,
        |    s0*(s2*st2y - s3*sty) - s1*(s1*st2y - s2*sty) + sy*(s1*s3 - s2*s2) AS det2
        |  FROM g)
        |SELECT event_type, round(det0/det, 6) AS b0, round(det1/det, 6) AS b1,
        |  round(det2/det, 6) AS b2
        |FROM c ORDER BY event_type""".stripMargin,

    "ml_scaler" -> (Pipe.dailySql +
      """, frame AS (
        |  SELECT d.*, lead(click) OVER (ORDER BY date_id) AS tgt FROM daily d),
        |clean AS (
        |  SELECT click, error, purchase, signup, view FROM frame
        |  WHERE click IS NOT NULL AND error IS NOT NULL AND purchase IS NOT NULL
        |    AND signup IS NOT NULL AND view IS NOT NULL AND tgt IS NOT NULL),
        |stats AS (
        |  SELECT avg(click) AS mc, stddev_samp(click) AS sc,
        |    avg(error) AS me, stddev_samp(error) AS se,
        |    avg(purchase) AS mp, stddev_samp(purchase) AS sp,
        |    avg(signup) AS ms, stddev_samp(signup) AS ss,
        |    avg(view) AS mv, stddev_samp(view) AS sv
        |  FROM clean)
        |SELECT feature, round(scaled_mean, 6) + 0.0 AS scaled_mean,
        |  round(scaled_std, 6) + 0.0 AS scaled_std
        |FROM (
        |  SELECT 'click' AS feature, avg((click - mc) / sc) AS scaled_mean,
        |    stddev_samp((click - mc) / sc) AS scaled_std FROM clean, stats
        |  UNION ALL
        |  SELECT 'error', avg((error - me) / se),
        |    stddev_samp((error - me) / se) FROM clean, stats
        |  UNION ALL
        |  SELECT 'purchase', avg((purchase - mp) / sp),
        |    stddev_samp((purchase - mp) / sp) FROM clean, stats
        |  UNION ALL
        |  SELECT 'signup', avg((signup - ms) / ss),
        |    stddev_samp((signup - ms) / ss) FROM clean, stats
        |  UNION ALL
        |  SELECT 'view', avg((view - mv) / sv),
        |    stddev_samp((view - mv) / sv) FROM clean, stats)
        |ORDER BY feature""".stripMargin),

    /** Granger F both ways from the same 14 moment sums, the same
      * centered-Gram closed form the engine assembles on the driver. */
    "ml_granger" ->
      """WITH ser0 AS (
        |  SELECT epoch_ns(ts) // 1800000000000 AS bucket,
        |    round(CAST(sum(CAST(CASE WHEN event_type = 'click' THEN value END
        |        AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(CASE WHEN event_type = 'click' THEN value END), 6) AS a,
        |    round(CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value END
        |        AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(CASE WHEN event_type = 'purchase' THEN value END), 6) AS b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |ser1 AS (
        |  SELECT bucket, a, b,
        |    lag(a) OVER (ORDER BY bucket) AS a1,
        |    lag(b) OVER (ORDER BY bucket) AS b1
        |  FROM ser0 WHERE a IS NOT NULL AND b IS NOT NULL),
        |ser AS (SELECT * FROM ser1 WHERE a1 IS NOT NULL AND b1 IS NOT NULL),
        |mo AS (
        |  SELECT count(*)::BIGINT AS n,
        |    sum(a) AS sa, sum(b) AS sb, sum(a1) AS sa1, sum(b1) AS sb1,
        |    sum(a*a) AS saa, sum(b*b) AS sbb,
        |    sum(a1*a1) AS sa1a1, sum(b1*b1) AS sb1b1, sum(a1*b1) AS sa1b1,
        |    sum(a*a1) AS saa1, sum(a*b1) AS sab1,
        |    sum(b*b1) AS sbb1, sum(b*a1) AS sba1
        |  FROM ser),
        |f AS (
        |  SELECT 'purchase_to_click' AS direction, n,
        |    saa - sa*sa/n AS cyy, sa1a1 - sa1*sa1/n AS c11,
        |    sb1b1 - sb1*sb1/n AS c22, sa1b1 - sa1*sb1/n AS c12,
        |    saa1 - sa*sa1/n AS cy1, sab1 - sa*sb1/n AS cy2
        |  FROM mo
        |  UNION ALL
        |  SELECT 'click_to_purchase', n,
        |    sbb - sb*sb/n, sb1b1 - sb1*sb1/n,
        |    sa1a1 - sa1*sa1/n, sa1b1 - sa1*sb1/n,
        |    sbb1 - sb*sb1/n, sba1 - sb*sa1/n
        |  FROM mo),
        |solve AS (
        |  SELECT direction, n,
        |    cyy - cy1*cy1/c11 AS ssr_r,
        |    cyy - ((cy1*c22 - cy2*c12) / (c11*c22 - c12*c12)) * cy1
        |        - ((cy2*c11 - cy1*c12) / (c11*c22 - c12*c12)) * cy2 AS ssr_u
        |  FROM f)
        |SELECT direction, n,
        |  round(ssr_u, 6) AS ssr_unrestricted,
        |  round((ssr_r - ssr_u) / (ssr_u / (n - 3)), 6) AS f_stat,
        |  round((ssr_r - ssr_u) / (ssr_u / (n - 3)), 6) > 3.841459 AS reject_95
        |FROM solve ORDER BY direction""".stripMargin,

    /** VAR(1) replay: same 14-moment frame, same centered-Gram 2×2
      * closed form per equation, same tail-row forecast. */
    "ml_var_forecast" ->
      """WITH ser0 AS (
        |  SELECT epoch_ns(ts) // 1800000000000 AS bucket,
        |    round(CAST(sum(CAST(CASE WHEN event_type = 'click' THEN value END
        |        AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(CASE WHEN event_type = 'click' THEN value END), 6) AS a,
        |    round(CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value END
        |        AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(CASE WHEN event_type = 'purchase' THEN value END), 6) AS b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |ser1 AS (
        |  SELECT bucket, a, b,
        |    lag(a) OVER (ORDER BY bucket) AS a1,
        |    lag(b) OVER (ORDER BY bucket) AS b1
        |  FROM ser0 WHERE a IS NOT NULL AND b IS NOT NULL),
        |fit AS (SELECT * FROM ser1 WHERE a1 IS NOT NULL AND b1 IS NOT NULL),
        |mo AS (
        |  SELECT count(*)::BIGINT AS n,
        |    sum(a) AS sa, sum(b) AS sb, sum(a1) AS sa1, sum(b1) AS sb1,
        |    sum(a1*a1) AS sa1a1, sum(b1*b1) AS sb1b1, sum(a1*b1) AS sa1b1,
        |    sum(a*a1) AS saa1, sum(a*b1) AS sab1,
        |    sum(b*b1) AS sbb1, sum(b*a1) AS sba1
        |  FROM fit),
        |gram AS (
        |  SELECT *, sa1a1 - sa1*sa1/n AS c11, sb1b1 - sb1*sb1/n AS c22,
        |    sa1b1 - sa1*sb1/n AS c12
        |  FROM mo),
        |gd AS (SELECT *, c11*c22 - c12*c12 AS det FROM gram),
        |eqs AS (
        |  SELECT 'click' AS equation, n, sa AS sy, saa1 AS sy1, sab1 AS sy2,
        |    sa1, sb1, c11, c22, c12, det FROM gd
        |  UNION ALL
        |  SELECT 'purchase', n, sb, sbb1, sba1, sa1, sb1, c11, c22, c12, det
        |  FROM gd),
        |sol AS (
        |  SELECT equation, n, sa1, sb1,
        |    ((sy1 - sy*sa1/n)*c22 - (sy2 - sy*sb1/n)*c12) / det AS b1,
        |    ((sy2 - sy*sb1/n)*c11 - (sy1 - sy*sa1/n)*c12) / det AS b2,
        |    sy FROM eqs),
        |coefs AS (
        |  SELECT equation, n, b1, b2,
        |    sy/n - b1*sa1/n - b2*sb1/n AS c0
        |  FROM sol),
        |tail AS (
        |  SELECT a AS la, b AS lb FROM fit ORDER BY bucket DESC LIMIT 1)
        |SELECT equation, n, round(c0, 6) AS intercept,
        |  round(b1, 6) AS coef_click_lag, round(b2, 6) AS coef_purchase_lag,
        |  round(c0 + b1*la + b2*lb, 6) AS forecast_next
        |FROM coefs, tail ORDER BY equation""".stripMargin,

    /** Pairwise-slope median replay: the day frame is calendar-bounded,
      * so the quadratic pair CTE is metadata-sized in both engines. */
    "ml_theilsen" ->
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT AS t,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value), 6) AS x
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |pairs AS (
        |  SELECT round((d2.x - d1.x) / (d2.t - d1.t), 6) AS slope
        |  FROM daily d1 JOIN daily d2 ON d2.t > d1.t),
        |m AS (SELECT round(median(slope), 6) + 0.0 AS slope FROM pairs),
        |res AS (SELECT round(x - m.slope * t, 6) AS r FROM daily, m)
        |SELECT (SELECT count(*)::BIGINT FROM daily) AS n_days,
        |  (SELECT count(*)::BIGINT FROM pairs) AS n_pairs,
        |  m.slope AS slope,
        |  (SELECT round(median(r), 6) + 0.0 FROM res) AS intercept
        |FROM m""".stripMargin)
}
