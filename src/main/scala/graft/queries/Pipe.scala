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
      * imputed). Oracle-checked: under the FIXED injection rates the
      * adaptive steps resolve deterministically — drop_sparse keeps
      * exactly the five event-type columns (70% > 50% threshold > 20%),
      * and top-2-by-variance resolves to (click, signup) with wide
      * margins at the verify SF (53.4 vs 41.3 vs 35.5 next — measured
      * sf0.01), which the SQL twin pins explicitly. */
    "cleaning_pipeline" -> ((s, d) => {
      val wide = ModelingFrame.daily(s, d)
        .withColumn("sparse_feat",
          when(col("date_id") % 10 < 7, lit(null).cast("double")).otherwise(col("error")))
        .withColumn("click",
          when(col("date_id") % 5 === 2, lit(null).cast("double")).otherwise(col("click")))
      val out = Reference.cleaningPipeline(wide, "date_id",
          featureCols = ModelingFrame.EventTypes :+ "sparse_feat",
          targetCols = ModelingFrame.EventTypes,
          maxNullPct = 50.0, topK = 2, leadDays = 1)
      out.columns.filter(_ != "date_id").foldLeft(out) {
        (acc, c) => acc.withColumn(c, round(col(c), 6))
      }.orderBy("date_id")
    }),

    /** §2.1 `scan_csv_transformed`: the reference's df_transformed.csv
      * analog — the feature-engineering output serialized to CSV and read
      * back with the schema pinned (including the `"a - b"` target column
      * names, which are the reference's API surface). Oracle = the same
      * SQL as `feature_pipeline`: any serialization loss hash-mismatches. */
    "scan_csv_transformed" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val path = s"/tmp/graft_csv/${new java.io.File(d).getName}/transformed"
      val out = qs("feature_pipeline")(s, d)
      graft.sources.Csv.write(out, path, single = true)
      val schema = StructType(
        StructField("date_id", IntegerType) +:
          Seq("lr_click", "lr_error", "lr_purchase", "lr_signup", "lr_view",
            "click - view", "purchase - signup")
            .map(c => StructField(c, DoubleType)))
      graft.sources.Csv.read(s, path, schema).orderBy("date_id")
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

  private[queries] val dailySql =
    """WITH daily AS (
      |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS date_id,
      |    avg(CASE WHEN event_type = 'click' THEN value END) AS click,
      |    avg(CASE WHEN event_type = 'error' THEN value END) AS error,
      |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
      |    avg(CASE WHEN event_type = 'signup' THEN value END) AS signup,
      |    avg(CASE WHEN event_type = 'view' THEN value END) AS view
      |  FROM events GROUP BY 1)
      |""".stripMargin

  /** DuckDB twin of the §3.2 cleaning spine. The adaptive steps are
    * pinned to their deterministic resolution (see the `qs` entry doc):
    * kept features = the five event types, top-2 targets = (click,
    * signup). The imputation twin is the same IGNORE NULLS ffill/bfill
    * as `impute_ffill_bfill`'s oracle. */
  private val cleaningSql = dailySql +
    """, wide AS (
      |  SELECT date_id,
      |    CASE WHEN date_id % 5 = 2 THEN NULL ELSE click END AS click,
      |    error, purchase, signup, view
      |  FROM daily)
      |, imputed AS (
      |  SELECT date_id,
      |    coalesce(
      |      last_value(click IGNORE NULLS) OVER (ORDER BY date_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |      first_value(click IGNORE NULLS) OVER (ORDER BY date_id
      |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS click,
      |    error, purchase, signup, view
      |  FROM wide)
      |, led AS (
      |  SELECT date_id,
      |    lead(click, 1) OVER (ORDER BY date_id) AS click_next,
      |    lead(signup, 1) OVER (ORDER BY date_id) AS signup_next
      |  FROM imputed)
      |SELECT i.date_id, round(i.click, 6) AS click, round(i.error, 6) AS error,
      |  round(i.purchase, 6) AS purchase, round(i.signup, 6) AS signup,
      |  round(i.view, 6) AS view,
      |  round(l.click_next, 6) AS click_next, round(l.signup_next, 6) AS signup_next
      |FROM imputed i JOIN led l ON i.date_id = l.date_id
      |WHERE l.click_next IS NOT NULL AND l.signup_next IS NOT NULL
      |ORDER BY i.date_id""".stripMargin

  val sql: Map[String, String] = Map(
    "cleaning_pipeline" -> cleaningSql,

    "feature_pipeline" -> (dailySql +
      """, lr AS (
        |  SELECT date_id,
        |    CASE WHEN click / nullif(lag(click) OVER w, 0) > 0
        |         THEN ln(click / nullif(lag(click) OVER w, 0)) END AS lr_click,
        |    CASE WHEN error / nullif(lag(error) OVER w, 0) > 0
        |         THEN ln(error / nullif(lag(error) OVER w, 0)) END AS lr_error,
        |    CASE WHEN purchase / nullif(lag(purchase) OVER w, 0) > 0
        |         THEN ln(purchase / nullif(lag(purchase) OVER w, 0)) END AS lr_purchase,
        |    CASE WHEN signup / nullif(lag(signup) OVER w, 0) > 0
        |         THEN ln(signup / nullif(lag(signup) OVER w, 0)) END AS lr_signup,
        |    CASE WHEN view / nullif(lag(view) OVER w, 0) > 0
        |         THEN ln(view / nullif(lag(view) OVER w, 0)) END AS lr_view
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

  /** `scan_csv_transformed` shares `feature_pipeline`'s twin (the CSV
    * round-trip must be lossless). Bound after `sql` so the map literal
    * above stays the single source of the query text. */
  val sqlAll: Map[String, String] = sql + ("scan_csv_transformed" -> sql("feature_pipeline"))
}
