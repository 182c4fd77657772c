package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.ModelingFrame
import graft.pipelines.{FeatureEngineering, Reference}
import graft.pipelines.FeatureEngineering.PairSpec

/** End-to-end pipeline queries (SURVEY.md §3 entry points). Rows-only
  * checks: the pipelines' constituent operators are each oracle-checked
  * individually; the composition result is validated by ScalaTest
  * postconditions (schema, row count, no-null assertions).
  */
object Pipe {

  type Q = (SparkSession, String) => DataFrame

  val qs: Map[String, Q] = Map(
    /** §3.1 serving query — THE flagship (one-row signal record). */
    "serving_signal" -> ((s, d) => Reference.servingSignal(s, d)),

    /** §3.2 cleaning spine on the daily wide frame with deterministic
      * null injection (sparse col ~70% null → dropped; moderate ~20% →
      * imputed). */
    "cleaning_pipeline" -> ((s, d) => {
      val wide = ModelingFrame.daily(s, d)
        .withColumn("sparse_feat",
          when(col("date_id") % 10 < 7, lit(null).cast("double")).otherwise(col("error")))
        .withColumn("click",
          when(col("date_id") % 5 === 2, lit(null).cast("double")).otherwise(col("click")))
      Reference.cleaningPipeline(wide, "date_id",
          featureCols = ModelingFrame.EventTypes :+ "sparse_feat",
          targetCols = ModelingFrame.EventTypes,
          maxNullPct = 50.0, topK = 2, leadDays = 1)
        .orderBy("date_id")
    }),

    /** §3.4 — pairs-mapping-driven feature engineering: the daily wide
      * frame → log-returns → per-pair lead-aligned spread targets, the
      * `df_transformed.csv` reconstruction. Oracle-checked. */
    "feature_pipeline" -> ((s, d) => {
      val out = FeatureEngineering.buildModelingTable(
        ModelingFrame.daily(s, d), "date_id", ModelingFrame.EventTypes,
        Seq(PairSpec("click", "view", 1), PairSpec("purchase", "signup", 2)))
      val rounded = out.columns.filter(_ != "date_id").foldLeft(out) {
        (acc, c) => acc.withColumn(c, round(col(s"`$c`"), 6))
      }
      rounded.orderBy("date_id")
    }),
  )

  private val dailySql =
    """WITH daily AS (
      |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS date_id,
      |    avg(CASE WHEN event_type = 'click' THEN value END) AS click,
      |    avg(CASE WHEN event_type = 'error' THEN value END) AS error,
      |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
      |    avg(CASE WHEN event_type = 'signup' THEN value END) AS signup,
      |    avg(CASE WHEN event_type = 'view' THEN value END) AS view
      |  FROM events GROUP BY 1)
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "feature_pipeline" -> (dailySql +
      """, lr AS (
        |  SELECT date_id,
        |    ln(click / lag(click) OVER w) AS lr_click,
        |    ln(error / lag(error) OVER w) AS lr_error,
        |    ln(purchase / lag(purchase) OVER w) AS lr_purchase,
        |    ln(signup / lag(signup) OVER w) AS lr_signup,
        |    ln(view / lag(view) OVER w) AS lr_view
        |  FROM daily WINDOW w AS (ORDER BY date_id))
        |, t AS (
        |  SELECT *,
        |    lead(lr_click - lr_view, 1) OVER (ORDER BY date_id) AS "click - view",
        |    lead(lr_purchase - lr_signup, 2) OVER (ORDER BY date_id) AS "purchase - signup"
        |  FROM lr)
        |SELECT date_id, round(lr_click, 6) AS lr_click, round(lr_error, 6) AS lr_error,
        |  round(lr_purchase, 6) AS lr_purchase, round(lr_signup, 6) AS lr_signup,
        |  round(lr_view, 6) AS lr_view,
        |  round("click - view", 6) AS "click - view",
        |  round("purchase - signup", 6) AS "purchase - signup"
        |FROM t
        |WHERE lr_click IS NOT NULL AND lr_error IS NOT NULL AND lr_purchase IS NOT NULL
        |  AND lr_signup IS NOT NULL AND lr_view IS NOT NULL
        |  AND "click - view" IS NOT NULL AND "purchase - signup" IS NOT NULL
        |ORDER BY date_id""".stripMargin),
  )
}
