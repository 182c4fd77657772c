package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Ensemble, Models, ModelingFrame}

/** The reference's top entry points recomposed from engine operators
  * (SURVEY.md §3): the serving query (`app.py` "Run Analysis", §3.1) and
  * the notebook cleaning spine (§3.2). These are driver-level
  * orchestrations of lazy DataFrame plans — the only actions are the
  * model fits and the driver-sized metric rows, exactly the adaptive
  * points SURVEY.md §4.3 allows.
  */
object Reference {

  /** §3.1 — the serving query: frame → ensemble fit → latest-row input →
    * point prediction → confidence + trade decision. One-row result, the
    * app's signal record (`app.py:159-189`).
    *
    * @param threshold     signal gate (deployed default 0.6, `app.py:218`)
    * @param minConfidence R² gate (deployed default 0.6, `app.py:224`)
    */
  def servingSignal(spark: SparkSession, dir: String,
                    threshold: Double = 0.6, minConfidence: Double = 0.6): DataFrame = {
    import spark.implicits._
    // coalesce(1): tiny day-level frame; iterative fits pay per-task
    // scheduling overhead per pass otherwise (see queries.Ml.withFrame)
    val assembled = ModelingFrame.assembled(spark, dir).coalesce(1).cache()
    try {
      // memoized fit on the DAY-grain reference frame (grain="daily" —
      // distinct cache entry from ml_ensemble_weighted's 30-minute frame)
      val fitted = Ensemble.fittedCached(spark, dir, ModelingFrame.Target, assembled)

      // default input = latest feature row (`app.py:242` last_row_lookup)
      val xInput = assembled.orderBy(desc("date_id")).limit(1)
      val localPreds = {
        // driver-path fit: one head() fetches the feature vector and all
        // members predict on the driver (bit-identical to the column/map
        // scoring — Ensemble.Scorer.predictLocal), no per-member job
        val x = xInput.select(col(Models.FeaturesCol)).head()
          .getAs[org.apache.spark.ml.linalg.Vector](0).toArray
        fitted.members.map(m => m.scorer.predictLocal(x))
      }
      val pointPred =
        if (localPreds.forall(_.isDefined))
          fitted.members.zip(localPreds)
            .map { case (m, p) => m.weight * p.get }.sum
        else {
          // MLlib-backed members (past the driver gate): one chained-
          // transform action scores all members at once
          val predRow = fitted.withMemberPredictions(xInput)
            .select(fitted.members.map(m => col(s"yhat_${m.name}")): _*).head()
          fitted.members.zipWithIndex
            .map { case (m, i) => m.weight * predRow.getDouble(i) }.sum
        }
      val avgR2 = fitted.members.map(_.r2).sum / fitted.members.size
      val avgMae = fitted.members.map(_.mae).sum / fitted.members.size

      // `interpret_confidence` (app.py:150-156) + decision table (159-189)
      val confidence =
        if (avgR2 >= 0.7) "High" else if (avgR2 >= 0.4) "Medium" else "Low"
      val (signal, reason) =
        if (math.abs(pointPred) < threshold || avgR2 < minConfidence)
          ("WAIT", f"signal ${math.abs(pointPred)}%.4f below threshold $threshold%.2f " +
            f"or confidence $avgR2%.4f below $minConfidence%.2f")
        else if (pointPred > 0)
          ("BUY_A_SELL_B", f"predicted rise ${pointPred}%.4f at confidence $avgR2%.4f")
        else
          ("SELL_A_BUY_B", f"predicted fall ${pointPred}%.4f at confidence $avgR2%.4f")
      val strength = math.min(math.abs(pointPred) / threshold, 1.0)

      Seq((ModelingFrame.Target, pointPred, avgR2, avgMae, confidence, signal,
          strength, reason))
        .toDF("target", "prediction", "avg_r2", "avg_mae", "confidence", "signal",
          "strength", "reason")
    } finally assembled.unpersist()
  }

  /** §3.2 — the cleaning spine on a wide frame: profile nulls → drop
    * sparse columns → ffill/bfill impute → assert no nulls → select
    * top-variance targets → lead-align → inner join features⋈targets.
    * Returns the merged modeling table (`df_merged`, cell 67/68).
    *
    * Operates on any wide frame keyed by `timeCol`; `featureCols` are
    * imputation candidates, `targetCols` ranked by variance. */
  def cleaningPipeline(wide: DataFrame, timeCol: String,
                       featureCols: Seq[String], targetCols: Seq[String],
                       maxNullPct: Double = 50.0, topK: Int = 2,
                       leadDays: Int = 1): DataFrame = {
    import graft.operators.{MissingData, Relational, TimeSeries}
    import org.apache.spark.sql.expressions.Window

    // profile (drives nothing downstream, mirrors notebook cells 9-26)
    val clean0 = MissingData.dropSparseColumns(wide, featureCols, maxNullPct)
    val kept = featureCols.filter(clean0.columns.contains)
    val imputed = MissingData.ffillBfill(clean0, Nil, Seq(col(timeCol)), kept)

    val nNulls = MissingData.totalNullCount(imputed, kept).head().getLong(0)
    require(nNulls == 0, s"impute left $nNulls nulls") // cell 52 assertion

    val top = Relational.topKByVariance(imputed, targetCols.filter(
        imputed.columns.contains), topK)
      .collect().map(_.getString(0)).toSeq.sorted

    val w = Window.orderBy(timeCol)
    val led = top.foldLeft(imputed) { (acc, t) =>
      acc.withColumn(s"${t}_next", lead(col(t), leadDays).over(w))
    }.na.drop("any", top.map(t => s"${t}_next"))

    val features = imputed.select((timeCol +: kept).map(col): _*)
    val targets = led.select((timeCol +: top.map(t => s"${t}_next")).map(col): _*)
    features.join(targets, timeCol)
  }
}
