package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

case class TS(series: String, t: Long, x: Double)

class TimeSeriesSpec extends SparkSpec {

  private def fixture = df(Seq(
    TS("s1", 1, 100.0), TS("s1", 2, 110.0), TS("s1", 3, 99.0), TS("s1", 4, 99.0),
    TS("s2", 1, 50.0), TS("s2", 2, 25.0)))

  private val part = Seq(col("series"))
  private val ord = Seq(col("t"))

  test("logReturns: ln(x_t/x_{t-1}), null first row per series") {
    val out = TimeSeries.logReturns(fixture, part, ord, "x", "lr")
      .orderBy("series", "t").collect()
    assert(out(0).isNullAt(3))
    assert(approx(out(1).getDouble(3), math.log(110.0 / 100.0)))
    assert(approx(out(3).getDouble(3), 0.0))
    assert(out(4).isNullAt(3))
    assert(approx(out(5).getDouble(3), math.log(0.5)))
  }

  test("lagFeatures: k lags, leakage-safe (nulls at series head)") {
    val out = TimeSeries.lagFeatures(fixture, part, ord, "x", Seq(1, 2))
      .orderBy("series", "t").collect()
    assert(out(0).isNullAt(3) && out(0).isNullAt(4))
    assert(approx(out(2).getAs[Double]("x_lag1"), 110.0))
    assert(approx(out(2).getAs[Double]("x_lag2"), 100.0))
  }

  test("rollingStats: trailing window including current row") {
    val out = TimeSeries.rollingStats(fixture, part, ord, "x", window = 2)
      .orderBy("series", "t").collect()
    assert(approx(out(0).getAs[Double]("x_rollmean"), 100.0)) // head: window of 1
    assert(approx(out(1).getAs[Double]("x_rollmean"), 105.0))
    assert(approx(out(2).getAs[Double]("x_rollmean"), 104.5))
    // stddev_samp of (110, 99)
    assert(approx(out(2).getAs[Double]("x_rollstd"), math.sqrt(60.5)))
  }

  test("leadPerKey: per-key heterogeneous horizons") {
    val d = df(Seq(
      TS("click", 1, 1.0), TS("click", 2, 2.0), TS("click", 3, 3.0),
      TS("view", 1, 10.0), TS("view", 2, 20.0), TS("view", 3, 30.0)))
    val out = TimeSeries.leadPerKey(d, col("series"), part, ord, "x",
        Map("click" -> 1, "view" -> 2), "led")
      .orderBy("series", "t").collect()
    assert(approx(out(0).getAs[Double]("led"), 2.0)) // click t=1 -> x at t=2
    assert(out(2).isNullAt(3))                       // click tail
    assert(approx(out(3).getAs[Double]("led"), 30.0)) // view t=1 -> x at t=3
    assert(out(4).isNullAt(3) && out(5).isNullAt(3))
  }

  test("spreads: a - b generated columns") {
    val d = df(Seq((1L, 5.0, 3.0))).toDF("id", "pa", "pb")
    val out = TimeSeries.spreads(d, Seq(("sp", "pa", "pb"))).head()
    assert(approx(out.getAs[Double]("sp"), 2.0))
  }

  test("dfTestStat matches the closed-form DF regression on a fixed series") {
    // AR(1) x_t = 0.5 x_{t-1} + e with fixed values: compute expected by hand
    val xs = Seq(1.0, 0.9, 0.3, 0.6, 0.1, 0.4, 0.2, 0.05)
    val d = df(xs.zipWithIndex.map { case (v, i) => TS("s", i.toLong, v) })
    val out = TimeSeries.dfTestStat(d, part, ord, "x").head()
    // closed form over (y=dx, x=lag): slope = Sxy/Sxx, se, t
    val x = xs.dropRight(1); val y = xs.drop(1).zip(x).map { case (a, b) => a - b }
    val n = x.size.toDouble
    val mx = x.sum / n; val my = y.sum / n
    val sxx = x.map(v => (v - mx) * (v - mx)).sum
    val syy = y.map(v => (v - my) * (v - my)).sum
    val sxy = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
    val slope = sxy / sxx
    val se = math.sqrt((syy - sxy * sxy / sxx) / (n - 2) / sxx)
    assert(out.getAs[Long]("n") == x.size)
    assert(approx(out.getAs[Double]("slope"), slope, 1e-9))
    assert(approx(out.getAs[Double]("df_tstat"), slope / se, 1e-9))
  }

  test("seasonalDesign: d=1 turns a linear trend into a constant; D=1 removes period-s pattern") {
    // y = 5 + 2t (+ seasonal bump): after Δ the series is the constant 2;
    // after Δ then Δ_3 the seasonal bump cancels exactly
    val season = Seq(0.0, 1.0, -1.0)
    val d = df((0 until 12).map(t => TS("s", t.toLong, 5.0 + 2.0 * t + season(t % 3))))
    val out = TimeSeries.seasonalDesign(d, part, ord, "x",
        TimeSeries.SeasonalOrder(p = 1, d = 1, P = 1, D = 1, s = 3))
      .orderBy("t").collect()
    // rows with full history: sar_y = Δy_t − Δy_{t-3} = 0 (trend AND season gone)
    out.drop(4).foreach(r => assert(approx(r.getAs[Double]("sar_y"), 0.0, 1e-12)))
    // the lag columns are the same series shifted
    val full = out.drop(5)
    full.foreach(r => assert(approx(r.getAs[Double]("sar_lag1"), 0.0, 1e-12)))
  }

  test("seasonalDesign + OLS recovers planted AR and seasonal-AR coefficients exactly") {
    // y_t = 0.6 y_{t-1} + 0.3 y_{t-7}, exact recursion from varied seeds:
    // every design row satisfies the relation exactly -> OLS must return
    // (0.6, 0.3) with zero residual (conditional least squares = truth)
    val init = Seq(1.0, -0.7, 0.4, 2.1, -1.3, 0.9, 1.7)
    val ys = Array.fill(120)(0.0)
    init.zipWithIndex.foreach { case (v, i) => ys(i) = v }
    for (t <- 7 until 120) ys(t) = 0.6 * ys(t - 1) + 0.3 * ys(t - 7)
    val d = df(ys.toSeq.zipWithIndex.map { case (v, t) => TS("s", t.toLong, v) })
    val so = TimeSeries.SeasonalOrder(p = 1, d = 0, P = 1, D = 0, s = 7)
    val design = TimeSeries.seasonalDesign(d, part, ord, "x", so).na.drop("any")
    val m = graft.ml.Models.ols("sar_y")
      .fit(graft.ml.Models.assemble(design, so.lagCols.map(_._1)))
    assert(approx(m.coefficients(0), 0.6, 1e-6), s"phi1 = ${m.coefficients(0)}")
    assert(approx(m.coefficients(1), 0.3, 1e-6), s"Phi1 = ${m.coefficients(1)}")
    assert(approx(m.intercept, 0.0, 1e-8))

    // 1-step forecast from the fitted model must equal the recursion's
    // own next value (newest-first tails; d=D=0 so sar_y == y)
    val recent = ys.reverse.toSeq
    val fc = TimeSeries.forecastNext(so, m.intercept,
      m.coefficients.toArray.toSeq, recent, recent)
    assert(approx(fc, 0.6 * ys(119) + 0.3 * ys(113), 1e-6), s"forecast $fc")
  }

  test("resampleOhlc: open/close follow the (ts, id) order, bars split on the day boundary") {
    val s = spark; import s.implicits._
    // key k: days 0..6 land in bar 0, days 7+ in bar 1; two rows share
    // ts=3 so the id tiebreak decides close of bar 0
    val d = Seq(
      ("k", 0, 10L, 5.0), ("k", 3, 11L, 9.0), ("k", 3, 12L, 2.0),
      ("k", 6, 9L, 7.0),  // ts order: day0 -> day3(id11) -> day3(id12) -> day6
      ("k", 7, 20L, 4.0), ("k", 13, 21L, 6.0),
      ("q", 1, 30L, 1.0))
      .toDF("k", "day", "id", "v")
    val out = TimeSeries.resampleOhlc(d, Seq(col("k")), col("day"),
        Seq(col("day"), col("id")), "v", days = 7)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toMap
    assert(out(("k", 0L)) == ((5.0, 9.0, 2.0, 7.0, 4L)))
    assert(out(("k", 1L)) == ((4.0, 6.0, 4.0, 6.0, 2L)))
    assert(out(("q", 0L)) == ((1.0, 1.0, 1.0, 1.0, 1L)))
    assert(out.size == 3)
  }

  test("sessionize: new session on first event and on gaps beyond the threshold") {
    // per-series times: s1 = 0, 5, 30, 32, 90 with maxGap 10 -> sessions 1,1,2,2,3
    val d = df(Seq(TS("s1", 0, 0), TS("s1", 1, 5), TS("s1", 2, 30),
      TS("s1", 3, 32), TS("s1", 4, 90), TS("s2", 0, 1000)).map(t =>
      TS(t.series, t.t, t.x)))
    val out = TimeSeries.sessionize(
        d.withColumn("ts", col("x").cast("long")), part, ord, "ts", maxGap = 10, "sid")
      .orderBy("series", "t").collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("t")) -> r.getAs[Long]("sid")).toMap
    assert(out(("s1", 0L)) == 1 && out(("s1", 1L)) == 1)
    assert(out(("s1", 2L)) == 2 && out(("s1", 3L)) == 2)
    assert(out(("s1", 4L)) == 3)
    assert(out(("s2", 0L)) == 1) // each key restarts at session 1
  }

  test("forecastNext undoes d=1, D=1, and d=D=1 differencing correctly") {
    // hand-built tails, no fitting: v̂ = 2 (intercept only, no lags)
    val so0 = TimeSeries.SeasonalOrder(p = 0, d = 1, P = 0, D = 0, s = 2)
    // y newest-first: y_T = 10  ->  ŷ = y_T + v̂ = 12
    assert(approx(TimeSeries.forecastNext(so0, 2.0, Nil, Nil, Seq(10.0, 7.0)), 12.0))
    val soS = TimeSeries.SeasonalOrder(p = 0, d = 0, P = 0, D = 1, s = 3)
    // ŷ = y_{T+1-3} + v̂: recentY = (y_T, y_{T-1}, y_{T-2}=y_{T+1-3}, …)
    assert(approx(TimeSeries.forecastNext(soS, 2.0, Nil, Nil, Seq(9.0, 8.0, 7.0, 6.0)), 9.0))
    val soB = TimeSeries.SeasonalOrder(p = 0, d = 1, P = 0, D = 1, s = 3)
    // ŷ = v̂ + y_T + y_{T+1-3} − y_{T-3} = 2 + 9 + 7 − 6 = 12
    assert(approx(TimeSeries.forecastNext(soB, 2.0, Nil, Nil, Seq(9.0, 8.0, 7.0, 6.0)), 12.0))
  }

  test("welch psd: segment count law, positive descending power, full overlap with raw top") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("ts_welch_psd")(spark, dir).collect()
    assert(rows.length == 10)
    val powers = rows.map(_.getAs[Double]("power"))
    assert(powers.toSeq == powers.toSeq.sorted.reverse)
    powers.foreach(p => assert(p >= 0))
    // every period was measured over the same full segment set
    val nBars = graft.Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .selectExpr("ts_ns div 1800000000000L as b").distinct().count()
    val expSegs = math.max(0L, (nBars - 256) / 128) + 1
    rows.foreach(r => assert(r.getAs[Long]("n_segments") == expSegs,
      s"segments ${r.getAs[Long]("n_segments")} vs $expSegs"))
  }
}
