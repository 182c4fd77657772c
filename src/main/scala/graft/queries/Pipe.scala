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
      * imputed). Oracle-checked AT ANY SF: drop_sparse resolves
      * deterministically under the fixed injection rates (70% > 50%
      * threshold > 20%), and the data-adaptive top-2-by-variance target
      * choice is emitted in LONG form (date_id, features…, target,
      * value_next) so the SQL twin REPLAYS the selection itself —
      * variance ranking with the same (desc, name) tiebreak — instead of
      * pinning one SF's resolution into static column names (which broke
      * the hash compare the moment the choice shifted at another SF). */
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
      val nextCols = out.columns.filter(_.endsWith("_next"))
      val idCols = out.columns.filterNot(_.endsWith("_next"))
      val long = out.unpivot(idCols.map(col), nextCols.map(col),
          "target", "value_next")
        .withColumn("target", expr("substring(target, 1, length(target) - 5)"))
      long.columns.filterNot(Seq("date_id", "target").contains).foldLeft(long) {
        (acc, c) => acc.withColumn(c, round(col(c), 6))
      }.orderBy("date_id", "target")
    }),

    /** §2.1 `scan_csv_transformed`: the reference's df_transformed.csv
      * analog — the feature-engineering output serialized to CSV and read
      * back with the schema pinned (including the `"a - b"` target column
      * names, which are the reference's API surface). Oracle = the same
      * SQL as `feature_pipeline`: any serialization loss hash-mismatches. */
    "scan_csv_transformed" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val path = graft.sources.Scratch.dir("csv", d, "transformed")
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
  /** The twin replays the ADAPTIVE target selection (top-2 sample
    * variance over the imputed frame, tiebreak variance DESC then name
    * ASC — `Relational.topKByVariance`'s exact ordering) in SQL, which
    * the long output shape makes expressible at any SF. A row survives
    * only where the engine's `na.drop` kept it: every chosen target's
    * lead is non-null, i.e. value_next IS NOT NULL per long row plus the
    * cross-target all-non-null date filter. */
  /** ffill+bfill twin for one column — the engine imputes EVERY kept
    * feature column, so the SQL must too (a day with zero events of one
    * type yields a natural null in any column at some SF/seed). */
  private def ffillBfillSql(c: String): String =
    s"""coalesce(
       |      last_value($c IGNORE NULLS) OVER (ORDER BY date_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |      first_value($c IGNORE NULLS) OVER (ORDER BY date_id
       |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS $c""".stripMargin

  private val cleaningSql = dailySql +
    s""", wide AS (
      |  SELECT date_id,
      |    CASE WHEN date_id % 5 = 2 THEN NULL ELSE click END AS click,
      |    error, purchase, signup, view
      |  FROM daily)
      |, imputed AS (
      |  SELECT date_id,
      |    ${Seq("click", "error", "purchase", "signup", "view")
                .map(ffillBfillSql).mkString(",\n    ")}
      |  FROM wide)""".stripMargin +
    """
      |, long AS (
      |  SELECT date_id, 'click' AS target, click AS v FROM imputed
      |  UNION ALL SELECT date_id, 'error', error FROM imputed
      |  UNION ALL SELECT date_id, 'purchase', purchase FROM imputed
      |  UNION ALL SELECT date_id, 'signup', signup FROM imputed
      |  UNION ALL SELECT date_id, 'view', view FROM imputed)
      |, top2 AS (
      |  SELECT target FROM (
      |    SELECT target, var_samp(v) AS vv FROM long GROUP BY target)
      |  ORDER BY vv DESC, target ASC LIMIT 2)
      |, led AS (
      |  SELECT date_id, target,
      |    lead(v, 1) OVER (PARTITION BY target ORDER BY date_id) AS value_next
      |  FROM long WHERE target IN (SELECT target FROM top2))
      |, kept AS (
      |  SELECT date_id FROM led GROUP BY date_id
      |  HAVING count(value_next) = 2)
      |SELECT i.date_id, round(i.click, 6) AS click, round(i.error, 6) AS error,
      |  round(i.purchase, 6) AS purchase, round(i.signup, 6) AS signup,
      |  round(i.view, 6) AS view,
      |  l.target, round(l.value_next, 6) AS value_next
      |FROM imputed i
      |JOIN kept k ON i.date_id = k.date_id
      |JOIN led l ON i.date_id = l.date_id
      |ORDER BY i.date_id, l.target""".stripMargin

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
