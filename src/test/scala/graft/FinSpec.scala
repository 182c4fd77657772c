package graft

import org.apache.spark.sql.functions._

/** Independent driver-side cross-checks for the financial-risk pack
  * (`queries/Fin.scala`). The DuckDB oracle pins cross-engine value
  * equality; these tests re-derive the statistics from the raw rows in
  * plain Scala — a different implementation of the same definition —
  * plus the structural laws (histogram identity, rank bounds, digit-law
  * normalization) the oracle can't express.
  */
class FinSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Driver-side rebuild of the 30-minute bar series for one type. */
  private def barsOf(tpe: String, d: String = dir): Array[(Long, Double)] =
    Tables.events(spark, d)
      .filter(col("event_type") === tpe)
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket").agg(round(avg(col("value")), 6).as("px"))
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

  test("ts_drawdown equals a driver-side running-peak scan per series") {
    val out = SparkEntry.queries("ts_drawdown")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    for (tpe <- Seq("click", "purchase", "view")) {
      val series = barsOf(tpe)
      var peak = Double.MinValue
      var best = (0.0, 0L, 0.0, 0.0) // dd, bucket, px, peak
      var first = true
      for ((b, px) <- series) {
        peak = math.max(peak, px)
        val dd = math.rint((px / peak - 1) * 1e6) / 1e6
        if (first || dd < best._1) { best = (dd, b, px, peak); first = false }
      }
      val r = out(tpe)
      assert(r.getAs[Long]("n_bars") == series.length)
      assert(math.abs(r.getAs[Double]("max_drawdown") - best._1) < 1e-9)
      assert(r.getAs[Long]("trough_bucket") == best._2,
        s"$tpe trough ${r.getAs[Long]("trough_bucket")} vs ${best._2}")
      assert(math.abs(r.getAs[Double]("peak_px") - best._4) < 1e-9)
    }
  }

  test("ts_atr: true range obeys its max identity and ATR is the 14-bar mean") {
    val rows = SparkEntry.queries("ts_atr")(spark, dir)
      .filter(col("event_type") === "click").orderBy("bucket")
      .collect().map(r => (r.getAs[Double]("tr"), r.getAs[Double]("atr")))
    assert(rows.length > 20, "need enough complete windows")
    // every ATR equals the mean of the trailing 14 TRs (the SMA law),
    // re-derived from the emitted TR column itself — but the first
    // emitted row's window reaches back to TR rows the completeness
    // filter dropped, so check from row 13 on
    for (i <- 13 until rows.length) {
      val win = (i - 13 to i).map(j => rows(j)._1)
      val m = math.rint(win.sum / 14 * 1e6) / 1e6
      assert(math.abs(rows(i)._2 - m) < 2e-6, s"row $i atr ${rows(i)._2} vs $m")
    }
    assert(rows.forall(_._1 >= 0), "true range is nonnegative")
  }

  test("ts_macd equals a driver-side truncated-EMA recomputation; histogram identity") {
    val out = SparkEntry.queries("ts_macd")(spark, dir)
      .filter(col("event_type") === "purchase").orderBy("bucket").collect()
    val px = barsOf("purchase").map(_._2)
    def ema(xs: Array[Double], i: Int, alpha: Double, depth: Int): Double = {
      val terms = (0 until depth).flatMap { k =>
        val j = i - k
        if (j < 0) None else Some((math.pow(1 - alpha, k) * xs(j), math.pow(1 - alpha, k)))
      }
      terms.map(_._1).sum / terms.map(_._2).sum
    }
    for (i <- out.indices) {
      val macd = math.rint((ema(px, i, 2.0 / 13, 40) - ema(px, i, 2.0 / 27, 40)) * 1e6) / 1e6
      assert(math.abs(out(i).getAs[Double]("macd") - macd) < 2e-6,
        s"bar $i macd ${out(i).getAs[Double]("macd")} vs $macd")
      val h = out(i).getAs[Double]("histogram")
      val m = out(i).getAs[Double]("macd"); val s = out(i).getAs[Double]("signal_line")
      assert(math.abs(h - math.rint((m - s) * 1e6) / 1e6) < 1e-9, "histogram identity")
    }
  }

  test("ts_risk_profile: moments and exact-rank VaR match a driver recomputation") {
    val out = SparkEntry.queries("ts_risk_profile")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    for (tpe <- Seq("click", "view")) {
      val px = barsOf(tpe).map(_._2)
      val r = px.sliding(2).collect { case Array(a, b) if a > 0 && b > 0 =>
        math.rint(math.log(b / a) * 1e6) / 1e6 }.toArray
      val n = r.length
      val mean = r.sum / n
      val sd = math.sqrt(r.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      val ann = math.sqrt(48.0 * 365)
      val row = out(tpe)
      assert(row.getAs[Long]("n") == n)
      assert(math.abs(row.getAs[Double]("ann_vol") - sd * ann) < 1e-4,
        s"$tpe ann_vol ${row.getAs[Double]("ann_vol")} vs ${sd * ann}")
      assert(math.abs(row.getAs[Double]("sharpe") - mean / sd * ann) < 1e-4)
      val k = math.ceil(n * 0.05).toInt
      val sorted = r.sorted
      assert(math.abs(row.getAs[Double]("var_95") - sorted(k - 1)) < 1e-9,
        s"$tpe VaR rank-$k")
      val cvar = math.rint(sorted.take(k).sum / k * 1e6) / 1e6
      assert(math.abs(row.getAs[Double]("cvar_95") - cvar) < 2e-6)
      assert(row.getAs[Double]("cvar_95") <= row.getAs[Double]("var_95") + 1e-9,
        "CVaR is at least as deep as VaR")
    }
  }

  test("stat_spearman matches a driver-side midrank correlation; bounds hold") {
    val rows = SparkEntry.queries("stat_spearman")(spark, dir).collect()
    assert(rows.length == 10, "5 choose 2 pairs")
    rows.foreach(r => assert(math.abs(r.getAs[Double]("rho")) <= 1.0 + 1e-9))
    val a = barsOf("click").toMap
    val b = barsOf("purchase").toMap
    val common = a.keySet.intersect(b.keySet).toArray.sorted
    val xa = common.map(a); val xb = common.map(b)
    def midranks(v: Array[Double]): Array[Double] = {
      val idx = v.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](v.length)
      var i = 0
      while (i < idx.length) {
        var j = i
        while (j + 1 < idx.length && idx(j + 1)._1 == idx(i)._1) j += 1
        val mid = (i + 1 + j + 1) / 2.0
        for (k <- i to j) out(idx(k)._2) = mid
        i = j + 1
      }
      out
    }
    val ra = midranks(xa); val rb = midranks(xb)
    val n = ra.length
    val ma = ra.sum / n; val mb = rb.sum / n
    val cov = ra.zip(rb).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val va = ra.map(x => (x - ma) * (x - ma)).sum
    val vb = rb.map(x => (x - mb) * (x - mb)).sum
    val rho = cov / math.sqrt(va * vb)
    val got = rows.find(r => r.getAs[String]("type_a") == "click" &&
      r.getAs[String]("type_b") == "purchase").get
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("rho") - rho) < 1e-6,
      s"rho ${got.getAs[Double]("rho")} vs driver $rho")
  }

  test("stat_benford: digit extraction, normalization, and driver recount") {
    val rows = SparkEntry.queries("stat_benford")(spark, dir).collect()
    val digits = rows.map(_.getAs[Int]("digit"))
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(math.abs(rows.map(_.getAs[Double]("obs_pct")).sum - 1.0) < 1e-4)
    // driver recount of leading digits from integer cents
    val counts = Tables.lineitem(spark, dir)
      .filter(col("l_extendedprice") > 0)
      .select(col("l_extendedprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100).toString.charAt(0).asDigit)
      .groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_obs") == counts(r.getAs[Int]("digit")),
        s"digit ${r.getAs[Int]("digit")} count")
    }
    rows.foreach(r => assert(r.getAs[Double]("chi2_term") >= 0))
  }

  test("agg_gini matches a driver-side sorted-rank formula; bounds hold") {
    val rows = SparkEntry.queries("agg_gini")(spark, dir).collect()
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= -1e-9 && g < 1.0, s"${r.getAs[String]("nation")} gini $g")
    }
    // recompute one nation end-to-end
    val nation = rows.head.getAs[String]("nation")
    val spend = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === nation)
      .select(col("x").cast("double"), col("o_custkey"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy { case (x, k) => (x, k) }
    val n = spend.length
    val tot = spend.map(_._1).sum
    val ix = spend.zipWithIndex.map { case ((x, _), i) => (i + 1) * x }.sum
    val gini = (2 * ix - (n + 1) * tot) / (n * tot)
    assert(rows.head.getAs[Long]("n_customers") == n)
    assert(math.abs(rows.head.getAs[Double]("gini") - gini) < 1e-6,
      s"$nation gini ${rows.head.getAs[Double]("gini")} vs driver $gini")
  }

  test("tail dependence: lambdas in [0,1], driver recount for one pair") {
    val rows = SparkEntry.queries("stat_tail_dependence")(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      Seq("lambda_upper", "lambda_lower").foreach { c =>
        Option(r.getAs[Any](c)).foreach { v =>
          val x = v.asInstanceOf[Double]
          assert(x >= 0 && x <= 1, s"$c out of range: $r")
        }
      }
      assert(r.getAs[Long]("nab_hi") <= r.getAs[Long]("na_hi"))
    }
    // driver recount of the upper-tail exceedance for click/view
    val a = barsOf("click"); val b = barsOf("view")
    def rets(s: Array[(Long, Double)]) = s.sliding(2).collect {
      case Array((_, x), (bk, y)) if x > 0 && y > 0 =>
        bk -> math.rint(math.log(y / x) * 1e6) / 1e6 }.toMap
    val (ra, rb) = (rets(a), rets(b))
    val common = ra.keySet.intersect(rb.keySet).toArray.sorted
    val xa = common.map(ra); val xb = common.map(rb)
    def midranks(v: Array[Double]): Array[Double] = {
      val sorted = v.sorted
      v.map { x =>
        val lo = sorted.indexWhere(_ == x) + 1
        val hi = sorted.lastIndexWhere(_ == x) + 1
        (lo + hi) / 2.0
      }
    }
    val n = common.length
    val (ua, ub) = (midranks(xa).map(_ / (n + 1)), midranks(xb).map(_ / (n + 1)))
    val naHi = ua.count(_ > 0.9)
    val nabHi = ua.zip(ub).count { case (p, q) => p > 0.9 && q > 0.9 }
    val got = rows.find(r => r.getAs[String]("type_a") == "click" &&
      r.getAs[String]("type_b") == "view").get
    assert(got.getAs[Long]("n") == n)
    assert(got.getAs[Long]("na_hi") == naHi && got.getAs[Long]("nab_hi") == nabHi,
      s"exceedances ${got.getAs[Long]("na_hi")}/${got.getAs[Long]("nab_hi")} vs $naHi/$nabHi")
  }

  test("interrupted time-series matches a driver-side segmented regression") {
    val rows = SparkEntry.queries("ml_intervention_its")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    for (tpe <- Seq("click", "purchase")) {
      val y = barsOf(tpe).map(_._2)
      val n = y.length
      val t = Array.tabulate(n)(_.toDouble)
      val st = Array.tabulate(n)(i => if (i >= n / 2.0) 1.0 else 0.0)
      def c(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, v) => x * v }.sum - a.sum * b.sum / n
      val (c11, c22, c12) = (c(t, t), c(st, st), c(t, st))
      val (cy1, cy2, cyy) = (c(t, y), c(st, y), c(y, y))
      val det = c11 * c22 - c12 * c12
      val beta = (cy1 * c22 - c12 * cy2) / det
      val gamma = (c11 * cy2 - cy1 * c12) / det
      val s2e = (cyy - beta * cy1 - gamma * cy2) / (n - 3)
      val tg = gamma / math.sqrt(s2e * (c11 / det))
      val r = rows(tpe)
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("trend") - beta) < 1e-4, s"$tpe trend")
      assert(math.abs(r.getAs[Double]("level_change") - gamma) < 1e-3, s"$tpe gamma")
      assert(math.abs(r.getAs[Double]("t_gamma") - tg) < 1e-2, s"$tpe t")
      assert(r.getAs[Boolean]("significant_95") ==
        (math.abs(r.getAs[Double]("t_gamma")) > 1.96))
    }
  }

  test("harmonic regression matches a driver-side least-squares replay") {
    val rows = SparkEntry.queries("ml_harmonic_regression")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    for (tpe <- Seq("click", "view")) {
      val px = barsOf(tpe).map(_._2)
      val n = px.length
      val twoPi = 2 * math.Pi
      val sn = Array.tabulate(n)(t => math.rint(math.sin(twoPi * t / 48) * 1e6) / 1e6)
      val cs = Array.tabulate(n)(t => math.rint(math.cos(twoPi * t / 48) * 1e6) / 1e6)
      def c(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum - a.sum * b.sum / n
      val (c11, c22, c12) = (c(sn, sn), c(cs, cs), c(sn, cs))
      val (cy1, cy2, cyy) = (c(sn, px), c(cs, px), c(px, px))
      val det = c11 * c22 - c12 * c12
      val beta = (cy1 * c22 - c12 * cy2) / det
      val gamma = (c11 * cy2 - cy1 * c12) / det
      val r = rows(tpe)
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-4, s"$tpe beta")
      assert(math.abs(r.getAs[Double]("gamma") - gamma) < 1e-4, s"$tpe gamma")
      val amp = math.sqrt(beta * beta + gamma * gamma)
      assert(math.abs(r.getAs[Double]("amplitude") - amp) < 1e-4)
      val r2 = (beta * cy1 + gamma * cy2) / cyy
      assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-4)
      assert(r.getAs[Double]("r2") >= -1e-9 && r.getAs[Double]("r2") <= 1 + 1e-9)
    }
  }

  test("fin_backtest_signal matches a driver-side backtest replay") {
    val rows = SparkEntry.queries("fin_backtest_signal")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    for (tpe <- Seq("click", "purchase")) {
      val px = barsOf(tpe).map(_._2)
      // replay: SMA(20) complete windows, next-bar log return, ±1 signal
      val recs = (19 until px.length - 1).flatMap { i =>
        val sma = px.slice(i - 19, i + 1).sum / 20
        if (px(i) > 0 && px(i + 1) > 0) {
          val sig = if (px(i) > sma) 1 else -1
          val ret = math.rint(math.log(px(i + 1) / px(i)) * 1e6) / 1e6
          Some((sig, sig * ret, ret))
        } else None
      }
      val r = rows(tpe)
      assert(r.getAs[Long]("n_bars") == recs.length)
      val strat = math.rint(recs.map(_._2).sum * 1e6) / 1e6
      val bh = math.rint(recs.map(_._3).sum * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("strat_return") - strat) < 2e-6,
        s"$tpe strat ${r.getAs[Double]("strat_return")} vs $strat")
      assert(math.abs(r.getAs[Double]("buyhold_return") - bh) < 2e-6)
      val flips = recs.map(_._1).sliding(2).count(w => w.length == 2 && w(0) != w(1))
      assert(r.getAs[Long]("turnover") == flips, s"$tpe turnover")
      val hit = recs.count(_._2 > 0).toDouble / recs.length
      assert(math.abs(r.getAs[Double]("hit_rate") - hit) < 1e-5)
      // max drawdown of the cumulative strategy curve
      var cum = 0.0; var peak = Double.MinValue; var mdd = 0.0
      recs.foreach { t =>
        cum += t._2; peak = math.max(peak, cum); mdd = math.min(mdd, cum - peak) }
      assert(math.abs(r.getAs[Double]("max_drawdown") - mdd) < 1e-4,
        s"$tpe mdd ${r.getAs[Double]("max_drawdown")} vs $mdd")
      assert(r.getAs[Double]("max_drawdown") <= 0.0)
    }
  }

  test("stat_mann_kendall matches a driver-side pairwise recomputation") {
    val rows = SparkEntry.queries("stat_mann_kendall")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    for (tpe <- Seq("click", "view")) {
      val px = barsOf(tpe).map(_._2)
      val n = px.length
      var s = 0L
      for (i <- 0 until n; j <- i + 1 until n)
        s += java.lang.Long.signum(java.lang.Double.compare(px(j), px(i))).toLong
      val ties = px.groupBy(identity).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val varS = (n.toLong * (n - 1) * (2L * n + 5) - ties) / 18.0
      val z =
        if (s > 0) (s - 1) / math.sqrt(varS)
        else if (s < 0) (s + 1) / math.sqrt(varS)
        else 0.0
      val r = rows(tpe)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("s_stat") == s, s"$tpe S ${r.getAs[Long]("s_stat")} vs $s")
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-3, s"$tpe z")
      val verdict = if (r.getAs[Double]("z") > 1.96) "increasing"
        else if (r.getAs[Double]("z") < -1.96) "decreasing" else "none"
      assert(r.getAs[String]("trend") == verdict)
    }
  }

  test("ml_factor_loadings: equal-weight index pins mean beta to ~1; driver recompute") {
    // sf0.001 has NO complete 30-min bucket (every bucket misses a
    // type), so the complete-bucket index is empty there by definition —
    // assert that degenerates gracefully, then cross-check at sf0.01
    assert(SparkEntry.queries("ml_factor_loadings")(spark, dir).count() == 0L)
    val dir01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("ml_factor_loadings")(spark, dir01).collect()
    assert(rows.length == 5)
    // the market is the equal-weight mean of the SAME five return series
    // over the SAME complete buckets, so cov(r_i, rm) averages to
    // var(rm) and mean(beta) = 1 up to the 1e-6 return grid
    val meanBeta = rows.map(_.getAs[Double]("beta")).sum / 5
    assert(math.abs(meanBeta - 1.0) < 0.01, s"mean beta $meanBeta")
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0 && r2 <= 1 + 1e-9, s"${r.getAs[String]("event_type")} r2 $r2")
    }
    // driver recompute for one series
    val series = Seq("click", "error", "purchase", "signup", "view")
      .map(t => barsOf(t, dir01))
    val rets = series.map(_.sliding(2).collect {
      case Array((_, a), (bk, b)) if a > 0 && b > 0 =>
        bk -> math.rint(math.log(b / a) * 1e6) / 1e6
    }.toMap)
    val common = rets.map(_.keySet).reduce(_ intersect _).toArray.sorted
    val rm = common.map(bk =>
      bk -> math.rint(rets.map(_(bk)).sum / 5 * 1e6) / 1e6).toMap
    val y = common.map(rets.head) // click
    val x = common.map(rm)
    val n = x.length
    val beta = (n * x.zip(y).map { case (a, b) => a * b }.sum - x.sum * y.sum) /
      (n * x.map(v => v * v).sum - x.sum * x.sum)
    val got = rows.find(_.getAs[String]("event_type") == "click").get
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("beta") - beta) < 1e-4,
      s"click beta ${got.getAs[Double]("beta")} vs driver $beta")
  }

  test("ml_cointegration matches a driver-side Engle-Granger recomputation") {
    val rows = SparkEntry.queries("ml_cointegration")(spark, dir).collect()
    assert(rows.length == 10)
    val a = barsOf("click").toMap
    val b = barsOf("error").toMap
    val common = a.keySet.intersect(b.keySet).toArray.sorted
    val x = common.map(a); val y = common.map(b)
    val n = x.length
    val sx = x.sum; val sy = y.sum
    val sxx = x.map(v => v * v).sum; val sxy = x.zip(y).map { case (u, v) => u * v }.sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val alpha = sy / n - beta * (sx / n)
    val e = x.zip(y).map { case (u, v) => math.rint((v - (alpha + beta * u)) * 1e6) / 1e6 }
    val e1 = e.dropRight(1); val de = e.tail.zip(e1).map { case (c, p) => c - p }
    val sed = e1.zip(de).map { case (u, v) => u * v }.sum
    val see = e1.map(v => v * v).sum
    val sdd = de.map(v => v * v).sum
    val gamma = sed / see
    val ssr = sdd - gamma * sed
    val t = gamma / math.sqrt((ssr / (e1.length - 1)) / see)
    val got = rows.find(r => r.getAs[String]("type_a") == "click" &&
      r.getAs[String]("type_b") == "error").get
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("beta") - beta) < 1e-4,
      s"beta ${got.getAs[Double]("beta")} vs $beta")
    assert(math.abs(got.getAs[Double]("adf_t") - t) < 1e-2,
      s"adf_t ${got.getAs[Double]("adf_t")} vs $t")
    assert(got.getAs[Boolean]("cointegrated") == (got.getAs[Double]("adf_t") < -3.34))
  }

  test("seasonal MK: planted within-weekday trend is maximal S and rejects") {
    import spark.implicits._
    // 28 days: value = week index + a big weekday offset — within each
    // weekday the series strictly increases, so every within-season pair
    // contributes +1 and S hits its maximum 7 * C(4,2) = 42
    val ev = (0 until 28).map { d =>
      ("click", d.toLong * 86400000000000L, (d / 7).toDouble + 10.0 * (d % 7))
    }.toDF("event_type", "ts_ns", "value")
    val out = graft.queries.Fin.seasonalMk(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("s_stat") == 42L, s"max S: $r")
    assert(r.getAs[Long]("n") == 28L && r.getAs[Long]("n_seasons") == 7L)
    // var = 7 * 4*3*13/18 = 60.666667; z = 41/sqrt(var) ~ 5.26
    assert(r.getAs[String]("trend") == "increasing", s"must reject: $r")
    assert(r.getAs[Double]("z") > 5.0)
  }

  test("seasonal MK on data: z/trend consistent, S bounded by pair count") {
    val out = SparkEntry.queries("stat_seasonal_mann_kendall")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val z = r.getAs[Double]("z")
      val trend = r.getAs[String]("trend")
      assert(trend == (if (z > 1.96) "increasing"
        else if (z < -1.96) "decreasing" else "none"))
      assert(math.abs(r.getAs[Long]("s_stat")) <=
        r.getAs[Long]("n") * (r.getAs[Long]("n") - 1) / 2)
    }
  }

  test("omega ratio: recomputable from its own exact sums, sign-consistent") {
    val out = SparkEntry.queries("fin_omega_ratio")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getAs[Double]("gain_sum")
      val l = r.getAs[Double]("loss_sum")
      assert(r.getAs[Long]("n_up") + r.getAs[Long]("n_down") <=
        r.getAs[Long]("n_days"))
      if (r.getAs[Long]("n_down") > 0) {
        val want = BigDecimal(g / l)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("omega") == want, s"omega recompute: $r")
        assert((r.getAs[Double]("omega") > 1.0) == (g > l))
      }
    }
  }

  test("hodges-lehmann equals a driver walsh-median replay, bit for bit") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("stat_hodges_lehmann")(spark, dir).collect()
      .map(r => r.getAs[String]("series") ->
        (r.getAs[Long]("n_walsh"), r.getAs[Double]("hl_estimate"))).toMap
    // rebuild the daily bars with the registry arithmetic and replay
    val bars = Tables.events(spark, dir)
      .withColumn("day", expr("ts_ns div 86400000000000L"))
      .groupBy(col("event_type"), col("day"))
      .agg(graft.queries.Grid.mean6(col("value")).as("px"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    bars.foreach { case (series, rows) =>
      val b = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val walsh = for {
        i <- b.indices; j <- i until b.length
      } yield ((b(i)._2 + b(j)._2) / 2, b(i)._1, b(j)._1)
      val sorted = walsh.sortBy(t => (t._1, t._2, t._3))
      val n = sorted.length
      val hl = BigDecimal(sorted((n + 1) / 2 - 1)._1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(series)._1 == n.toLong, s"$series n_walsh")
      assert(out(series)._2 == hl, s"$series: ${out(series)._2} vs $hl")
    }
  }

  test("drawdown duration equals a driver gaps-and-islands replay") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ts_drawdown_duration")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val bars = Tables.events(spark, dir)
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(graft.queries.Grid.mean6(col("value")).as("px"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    bars.foreach { case (series, rows) =>
      val b = rows.map(t => (t._2, t._3)).sortBy(_._1)
      var peak = Double.MinValue
      var spells = List.empty[(Long, Long)] // (start bucket, len)
      var cur: Option[(Long, Long)] = None
      b.foreach { case (bk, px) =>
        peak = math.max(peak, px)
        if (px < peak) cur = cur match {
          case Some((s0, l)) => Some((s0, l + 1))
          case None => Some((bk, 1L))
        } else {
          cur.foreach(c => spells ::= c)
          cur = None
        }
      }
      cur.foreach(c => spells ::= c)
      val r = out(series)
      assert(r.getAs[Long]("n_spells") == spells.length.toLong, s"$series spells")
      assert(r.getAs[Long]("n_underwater_bars") == spells.map(_._2).sum)
      val best = spells.sortBy(s => (-s._2, s._1)).head
      assert(r.getAs[Long]("max_spell_bars") == best._2, s"$series len")
      assert(r.getAs[Long]("max_spell_start") == best._1, s"$series start")
    }
  }
}
