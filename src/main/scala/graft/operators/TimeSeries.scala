package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Time-series / window operators (SURVEY.md §2.7).
  *
  * The reference runs every order-sensitive op over ONE global 1961-row
  * series (`Window.orderBy(date_id)` with no partition). That is correct
  * at notebook scale and catastrophic at 100 TB (single task). Every
  * operator here therefore takes an explicit `partition` (series key);
  * pass `Nil` only for provably tiny frames.
  */
object TimeSeries {

  private def w(partition: Seq[Column], order: Seq[Column]): WindowSpec =
    if (partition.isEmpty) Window.orderBy(order: _*)
    else Window.partitionBy(partition: _*).orderBy(order: _*)

  /** `log_returns` (reconstructed stage, SURVEY.md §3.4; attested by
    * `Presentation.pptx` slide13 "differencing, log returns"):
    * ln(x_t / x_{t-1}) along the series. First row per series is null, and
    * so is any row after a zero tick — `nullif` keeps ANSI mode from
    * throwing DIVIDE_BY_ZERO on bad data (a zero price is a data defect,
    * not a reason to kill a 100 TB job; `log` already nulls x ≤ 0). */
  def logReturns(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                 valueCol: String, outCol: String): DataFrame =
    df.withColumn(outCol,
      log(col(valueCol) / nullif(lag(col(valueCol), 1).over(w(partition, order)), lit(0))))

  /** `lag_features` (`README.md:31`): leakage-safe lagged predictor
    * columns x_{t-1}..x_{t-k}. */
  def lagFeatures(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                  valueCol: String, lags: Seq[Int]): DataFrame =
    lags.foldLeft(df) { (acc, k) =>
      acc.withColumn(s"${valueCol}_lag$k", lag(col(valueCol), k).over(w(partition, order)))
    }

  /** `rolling_stats` (`slide13.xml` "rolling averages, volatility
    * measures"): trailing-window mean and sample stddev over the last
    * `window` rows INCLUDING the current one (pandas
    * `rolling(window)` semantics). Trailing-only frames are leakage-safe. */
  def rollingStats(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                   valueCol: String, window: Int): DataFrame = {
    val frame = w(partition, order).rowsBetween(-(window - 1), Window.currentRow)
    df.withColumn(s"${valueCol}_rollmean", avg(col(valueCol)).over(frame))
      .withColumn(s"${valueCol}_rollstd", stddev_samp(col(valueCol)).over(frame))
  }

  /** `ts_resample_ohlc`: calendar resampling of a tick/row stream into
    * per-key OHLC bars — the pandas `resample('W').ohlc()` hallmark of
    * the reference's domain, reshaped for scale: ONE keyed aggregation
    * (map-side partial combine), no window, no sort. open/close are
    * `min_by`/`max_by` on a (ts, id) struct — an explicit total order,
    * so ties at equal timestamps have a well-defined winner on both
    * engines. The bucket is integer `epoch-day div days` (engine-neutral
    * anchor; calendar-origin functions like DuckDB's `time_bucket`
    * anchor differently than Spark's `window()` and would silently
    * disagree).
    *
    * @param dayCol  epoch-day ordinal column
    * @param days    bar width in days (7 = weekly bars)
    */
  def resampleOhlc(df: DataFrame, keys: Seq[Column], dayCol: Column,
                   orderCols: Seq[Column], valueCol: String,
                   days: Int): DataFrame = {
    require(days >= 1, "bar width must be >= 1 day")
    val tie = struct(orderCols: _*)
    df.withColumn("bar", floor(dayCol / days).cast("long"))
      .groupBy(keys :+ col("bar"): _*)
      .agg(
        min_by(col(valueCol), tie).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), tie).as("close"),
        count(lit(1)).as("n"))
  }

  /** `lead_per_target` (`Marilyn_Cleaning.ipynb` cell 67): shift a column
    * forward by a per-key horizon taken from a small mapping table
    * (`target_pairs.lag` ∈ {1..4}). pandas does `shift(-lag)` per column;
    * here the horizons are distinct `lead(value, k)` expressions selected
    * by a CASE on the key — one window pass, no join, no driver loop over
    * rows. The mapping (hundreds of entries) is driver-held metadata, as
    * in the reference (SURVEY.md §4.3.2). */
  def leadPerKey(df: DataFrame, keyCol: Column, partition: Seq[Column],
                 order: Seq[Column], valueCol: String, horizons: Map[String, Int],
                 outCol: String): DataFrame = {
    val spec = w(partition, order)
    val cases = horizons.toSeq.sortBy(_._1).map { case (k, h) =>
      (keyCol === lit(k), lead(col(valueCol), h).over(spec))
    }
    val expr = cases.tail.foldLeft(when(cases.head._1, cases.head._2)) {
      case (acc, (cond, value)) => acc.when(cond, value)
    }
    df.withColumn(outCol, expr)
  }

  /** `spread_compute` (realized in `Data/df_transformed.csv` header;
    * `README.md:30`): pairwise difference columns `a − b`, generated from
    * a (name, legA, legB) spec. */
  def spreads(df: DataFrame, pairs: Seq[(String, String, String)]): DataFrame =
    pairs.foldLeft(df) { case (acc, (name, a, b)) =>
      acc.withColumn(name, col(a) - col(b))
    }

  /** Seasonal-ARIMA regression order: AR lags `p`, differencing `d`,
    * seasonal AR lags `P` at period `s`, seasonal differencing `D` —
    * SARIMA(p,d,0)(P,D,0)_s. MA terms are deliberately absent: they need
    * iterative Kalman/CSS fitting (statsmodels' path) that is serial by
    * nature; the reference's hybrid drew its value from the regression
    * side (`slide22.xml`), which reduces exactly to OLS on this design. */
  final case class SeasonalOrder(p: Int, d: Int, P: Int, D: Int, s: Int) {
    require(p >= 0 && P >= 0 && d >= 0 && d <= 1 && D >= 0 && D <= 1,
      "supported orders: p,P >= 0; d,D in {0,1}")
    require(P == 0 && D == 0 || s >= 2, "seasonal terms need a period s >= 2")
    /** Design column names, AR lags then seasonal lags. */
    def lagCols: Seq[(String, Int)] =
      (1 to p).map(k => (s"sar_lag$k", k)) ++
        (1 to P).map(j => (s"sar_slag${j * s}", j * s))
  }

  /** `ml_sarima` design builder: the differenced series
    * `sar_y = Δ^d Δ_s^D value` plus its AR and seasonal-AR lag columns —
    * everything from ONE window spec (chained `lag`s; Catalyst collapses
    * same-spec window functions into a single Window node per level).
    * Rows whose lags reach before the series start carry nulls — the
    * caller drops them before fitting. OLS on (sar_y ~ lagCols) is then
    * the exact conditional-least-squares AR fit, distributed. */
  def seasonalDesign(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                     valueCol: String, so: SeasonalOrder): DataFrame = {
    val spec = w(partition, order)
    val diffed = {
      val d1 = if (so.d == 1) col(valueCol) - lag(col(valueCol), 1).over(spec)
               else col(valueCol)
      val base = df.withColumn("__d", d1)
      if (so.D == 1) base.withColumn("sar_y", col("__d") - lag(col("__d"), so.s).over(spec))
      else base.withColumn("sar_y", col("__d"))
    }
    so.lagCols.foldLeft(diffed.drop("__d")) { case (acc, (name, k)) =>
      acc.withColumn(name, lag(col("sar_y"), k).over(spec))
    }
  }

  /** Sessionization: split each key's event stream into sessions at
    * time gaps > `maxGap` (same units as `tsCol`). A row starts a new
    * session when it has no predecessor or the gap exceeds the
    * threshold; the session id is the running count of session starts —
    * two window expressions over ONE (partition, order) sort, no joins,
    * no state. The batch twin of streaming session windows. */
  def sessionize(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                 tsCol: String, maxGap: Long, outCol: String): DataFrame = {
    val spec = w(partition, order)
    val gap = col(tsCol) - lag(col(tsCol), 1).over(spec)
    val isNew = when(gap.isNull || gap > maxGap, lit(1)).otherwise(lit(0))
    df.withColumn(outCol,
      sum(isNew).over(spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** 1-step-ahead forecast from a fitted seasonal-AR: evaluate the lag
    * polynomial on the differenced tail, then undo the differencing.
    *
    * @param intercept,coefs OLS fit of (sar_y ~ so.lagCols), coefs in
    *                        lagCols order
    * @param recentSarY      differenced series, NEWEST first — at least
    *                        max(lag) values
    * @param recentY         raw series, NEWEST first — at least s+1 values
    *                        when d=D=1 (the undifferencing taps y_T,
    *                        y_{T+1-s} and y_{T-s})
    */
  def forecastNext(so: SeasonalOrder, intercept: Double, coefs: Seq[Double],
                   recentSarY: Seq[Double], recentY: Seq[Double]): Double = {
    val lags = so.lagCols.map(_._2)
    require(coefs.size == lags.size, "one coefficient per design lag")
    require(lags.isEmpty || recentSarY.size >= lags.max, "need max(lag) recent sar_y values")
    val vNext = intercept +
      lags.zipWithIndex.map { case (k, i) => coefs(i) * recentSarY(k - 1) }.sum
    // v = Δ^d Δ_s^D y  ⇒  y_{T+1} = v̂ + d·y_T + D·(y_{T+1−s} − d·y_{T−s})
    vNext +
      (if (so.d == 1) recentY.head else 0.0) +
      (if (so.D == 1) recentY(so.s - 1) - (if (so.d == 1) recentY(so.s) else 0.0)
       else 0.0)
  }

  /** `stationarity_test` (`Marilyn_Cleaning.ipynb` cell 1 imports
    * `adfuller`; `slide14.xml` "Stationary check"): Dickey-Fuller test
    * statistic per series, fully distributed.
    *
    * Regresses Δx_t on x_{t-1} (lag-order-0 DF, the `adfuller(maxlag=0)`
    * regression "c" case): t = β̂ / se(β̂) with
    * se² = (S_yy − S_xy²/S_xx) / (n−2) / S_xx. Everything reduces to the
    * standard `regr_*` aggregates, so the whole test is one
    * map-side-combinable aggregation per series — no driver collect, no
    * per-series fit loop. Output: (series key cols, n, slope, df_tstat).
    * A df_tstat far below ≈ −2.86 rejects a unit root (series stationary).
    */
  def dfTestStat(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                 valueCol: String): DataFrame = {
    val spec = w(partition, order)
    val prev = lag(col(valueCol), 1).over(spec)
    val withLag = df
      .withColumn("__x", prev)
      .withColumn("__y", col(valueCol) - prev)
      .filter(col("__x").isNotNull)
    val grouped = if (partition.isEmpty) withLag.groupBy() else withLag.groupBy(partition: _*)
    grouped.agg(
        expr("regr_count(__y, __x)").as("n"),
        expr("regr_slope(__y, __x)").as("slope"),
        expr("regr_sxx(__y, __x)").as("sxx"),
        expr("regr_syy(__y, __x)").as("syy"),
        expr("regr_sxy(__y, __x)").as("sxy"))
      .withColumn("df_tstat",
        col("slope") / sqrt(
          (col("syy") - col("sxy") * col("sxy") / col("sxx"))
            / (col("n") - lit(2)) / col("sxx")))
      .drop("sxx", "syy", "sxy")
  }
}
