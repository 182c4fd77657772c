package graft

import org.apache.spark.sql.functions._

import graft.ml.Garch

/** Laws + independent driver-side cross-checks for the round-8 forecast
  * diagnostics pack (baselines, Ljung–Box, Granger, Theil–Sen,
  * Diebold–Mariano, kernel smoother), the GARCH(1,1) estimator, and the
  * graph/aggregation additions (triangle counting, partial-aggregate
  * merge). The DuckDB oracle pins value equality for the SQL-expressible
  * queries; these tests pin the STATISTICS against independent
  * recomputation and the estimator against simulated ground truth, which
  * the oracle (same formula, different engine) cannot do.
  */
class ForecastPackSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // ---- GARCH(1,1) --------------------------------------------------

  /** Deterministic GARCH(1,1) sample path via a seeded Gaussian RNG. */
  private def simulate(n: Int, omega: Double, alpha: Double, beta: Double,
                       seed: Long): Array[Double] = {
    val rng = new java.util.Random(seed)
    val r = new Array[Double](n)
    var s2 = omega / (1 - alpha - beta)
    var t = 0
    while (t < n) {
      if (t > 0) s2 = omega + alpha * r(t - 1) * r(t - 1) + beta * s2
      r(t) = math.sqrt(s2) * rng.nextGaussian()
      t += 1
    }
    r
  }

  test("garch: recovers planted (alpha, beta) from a simulated path") {
    val r = simulate(6000, omega = 0.1, alpha = 0.10, beta = 0.80, seed = 42)
    val f = Garch.fit(r)
    assert(math.abs(f.alpha - 0.10) < 0.05, s"alpha=${f.alpha}")
    assert(math.abs(f.beta - 0.80) < 0.10, s"beta=${f.beta}")
    assert(f.persistence < 1.0)
    assert(f.uncondVar > 0)
  }

  test("garch: the GRIDDED fit (the ml_garch oracle path) recovers planted params too") {
    // the r16 conversion ladder: 1e-9-gridded vertices, 1e-6-gridded
    // objective, stable (value, index) sort — same recovery law as the
    // full-precision fit, slightly looser (the objective grid stops the
    // simplex one grid-cell earlier)
    val r = simulate(6000, omega = 0.1, alpha = 0.10, beta = 0.80, seed = 42)
    val f = Garch.fitGridded(r)
    assert(math.abs(f.alpha - 0.10) < 0.06, s"alpha=${f.alpha}")
    assert(math.abs(f.beta - 0.80) < 0.12, s"beta=${f.beta}")
    assert(f.persistence < 1.0)
    assert(f.uncondVar > 0)
    // determinism: a second run reproduces bit-identically
    val f2 = Garch.fitGridded(r)
    assert(f.omega == f2.omega && f.alpha == f2.alpha && f.beta == f2.beta
      && f.logLik == f2.logLik)
    // and the gridded optimum is close to the full-precision one in loglik
    val full = Garch.fit(r)
    assert(math.abs(f.logLik - full.logLik) < 1.0,
      s"gridded ${f.logLik} vs full ${full.logLik}")
  }

  test("garch: the MLE dominates the true parameters on the sample") {
    val r = simulate(3000, omega = 0.2, alpha = 0.15, beta = 0.70, seed = 7)
    val f = Garch.fit(r)
    val atTrue = -Garch.negLogLik(r, 0.2, 0.15, 0.70)
    assert(f.logLik >= atTrue - 1e-6,
      s"fitted loglik ${f.logLik} below true-parameter loglik $atTrue")
  }

  test("garch: infeasible parameters are rejected, not evaluated") {
    val r = simulate(100, 0.1, 0.1, 0.8, seed = 1)
    assert(Garch.negLogLik(r, -0.1, 0.1, 0.8) == Double.MaxValue)
    assert(Garch.negLogLik(r, 0.1, -0.01, 0.8) == Double.MaxValue)
    assert(Garch.negLogLik(r, 0.1, 0.5, 0.5) == Double.MaxValue) // α+β=1
  }

  test("garch: variance path follows the recursion and stays positive") {
    val r = simulate(200, 0.1, 0.1, 0.8, seed = 3)
    val p = Garch.variancePath(r, 0.1, 0.1, 0.8)
    assert(p.forall(_ > 0))
    assert(math.abs(p(0) - Garch.sampleVar(r)) < 1e-12)
    for (t <- 1 until p.length)
      assert(math.abs(p(t) - (0.1 + 0.1 * r(t - 1) * r(t - 1) + 0.8 * p(t - 1))) < 1e-12)
  }

  test("nelder-mead: minimizes a shifted quadratic to high precision") {
    val best = Garch.nelderMead(
      th => (th(0) - 1.5) * (th(0) - 1.5) + 2 * (th(1) + 0.5) * (th(1) + 0.5),
      Array(0.0, 0.0), step = 0.5, maxIter = 500)
    assert(math.abs(best(0) - 1.5) < 1e-4 && math.abs(best(1) + 0.5) < 1e-4)
  }

  // ---- forecast diagnostics ----------------------------------------

  test("baselines: MAE/RMSE match a driver recomputation on the same support") {
    val rows = SparkEntry.queries("ts_forecast_baselines")(spark, dir)
      .collect().map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mae"), r.getAs[Double]("rmse")))).toMap
    val px = Tables.events(spark, dir).filter(col("event_type") === "click")
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket").agg(round(avg(col("value")), 6).as("px"))
      .orderBy("bucket").collect().map(_.getDouble(1))
    val idx = px.indices.drop(48) // rn > 48 in 1-based terms = index >= 48
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val naiveErrs = idx.map(i => r6(px(i) - px(i - 1)))
    val snaiveErrs = idx.map(i => r6(px(i) - px(i - 48)))
    val driftErrs = idx.map { i =>
      val pred = r6(px(i - 1) + (px(i - 1) - px(0)) / (i - 1.0))
      r6(px(i) - pred)
    }
    for ((name, errs) <- Seq("naive" -> naiveErrs,
        "seasonal_naive" -> snaiveErrs, "drift" -> driftErrs)) {
      val (n, mae, rmse) = rows(name)
      assert(n == idx.length, s"$name n=$n vs ${idx.length}")
      assert(math.abs(mae - errs.map(math.abs).sum / n) < 1e-5, name)
      assert(math.abs(rmse - math.sqrt(errs.map(e => e * e).sum / n)) < 1e-5, name)
    }
  }

  test("ljung-box: Q ladder is nonnegative, monotone, and chi2-thresholded") {
    val rows = SparkEntry.queries("stat_ljung_box")(spark, dir)
      .orderBy("lag").collect()
    assert(rows.length == 10)
    val qs = rows.map(_.getAs[Double]("q_stat"))
    assert(qs.forall(_ >= 0))
    for (i <- 1 until qs.length) assert(qs(i) >= qs(i - 1) - 1e-9,
      "Q is a cumulative sum of nonnegative terms")
    rows.foreach { r =>
      val acf = r.getAs[Double]("acf")
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9)
      assert(r.getAs[Boolean]("reject_95") ==
        (r.getAs[Double]("q_stat") > r.getAs[Double]("crit_95")))
    }
  }

  test("granger: F matches an explicit driver-side nested-OLS fit") {
    val rows = SparkEntry.queries("ml_granger")(spark, dir)
      .collect().map(r => r.getAs[String]("direction") -> r).toMap
    val ser = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket")
      .agg(round(avg(when(col("event_type") === "click", col("value"))), 6).as("a"),
        round(avg(when(col("event_type") === "purchase", col("value"))), 6).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .orderBy("bucket").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val y = ser.drop(1).map(_._1); val y1 = ser.dropRight(1).map(_._1)
    val x1 = ser.dropRight(1).map(_._2)
    // restricted: y ~ 1 + y1 (centered simple regression)
    val n = y.length
    def mean(v: Array[Double]) = v.sum / v.length
    val (my, m1, m2) = (mean(y), mean(y1), mean(x1))
    def dot(u: Array[Double], mu: Double, v: Array[Double], mv: Double) =
      u.zip(v).map { case (a, b) => (a - mu) * (b - mv) }.sum
    val ssrR = dot(y, my, y, my) -
      math.pow(dot(y, my, y1, m1), 2) / dot(y1, m1, y1, m1)
    // unrestricted: solve the 2x2 centered system directly
    val c11 = dot(y1, m1, y1, m1); val c22 = dot(x1, m2, x1, m2)
    val c12 = dot(y1, m1, x1, m2)
    val cy1 = dot(y, my, y1, m1); val cy2 = dot(y, my, x1, m2)
    val det = c11 * c22 - c12 * c12
    val b1 = (cy1 * c22 - cy2 * c12) / det
    val b2 = (cy2 * c11 - cy1 * c12) / det
    val ssrU = dot(y, my, y, my) - b1 * cy1 - b2 * cy2
    val f = (ssrR - ssrU) / (ssrU / (n - 3))
    val got = rows("purchase_to_click")
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("f_stat") - f) < 1e-3,
      s"F=${got.getAs[Double]("f_stat")} vs driver $f")
    assert(got.getAs[Double]("f_stat") >= -1e-9)
    assert(rows("click_to_purchase").getAs[Double]("f_stat") >= -1e-9)
  }

  test("theil-sen: one planted outlier day cannot drag the slope (robustness)") {
    // pure-estimator law on synthetic data: y = 2t + noise-free, one wild point
    val clean = (0 until 30).map(t => (t.toLong, 2.0 * t))
    val dirty = clean.updated(15, (15L, 1e6))
    def fit(pts: Seq[(Long, Double)]): Double = {
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)).sorted
      if (slopes.length % 2 == 1) slopes(slopes.length / 2)
      else (slopes(slopes.length / 2 - 1) + slopes(slopes.length / 2)) / 2
    }
    assert(math.abs(fit(clean) - 2.0) < 1e-12)
    assert(math.abs(fit(dirty) - 2.0) < 0.2,
      "median-of-slopes must shrug off a single outlier")
    // and the registered query returns a finite slope on real data
    val r = SparkEntry.queries("ml_theilsen")(spark, dir).head()
    assert(r.getAs[Long]("n_pairs") ==
      r.getAs[Long]("n_days") * (r.getAs[Long]("n_days") - 1) / 2)
    assert(!r.getAs[Double]("slope").isNaN)
  }

  test("diebold-mariano: statistic matches driver recomputation; verdict consistent") {
    val out = SparkEntry.queries("ml_diebold_mariano")(spark, dir).head()
    val px = Tables.events(spark, dir).filter(col("event_type") === "click")
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket").agg(round(avg(col("value")), 6).as("px"))
      .orderBy("bucket").collect().map(_.getDouble(1))
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val d = px.indices.drop(48).map { i =>
      val e1 = px(i) - px(i - 1); val e2 = px(i) - px(i - 48)
      r6(e1 * e1 - e2 * e2)
    }
    val n = d.length
    val mean = d.sum / n
    val g0 = d.map(x => x * x).sum / n - mean * mean
    val dm = mean / math.sqrt(g0 / n)
    assert(out.getAs[Long]("n") == n)
    assert(math.abs(out.getAs[Double]("dm_stat") - dm) < 1e-3,
      s"DM=${out.getAs[Double]("dm_stat")} vs driver $dm")
    val favored = out.getAs[String]("favored")
    assert(favored == (if (out.getAs[Double]("dm_stat") < 0) "naive"
      else "seasonal_naive"))
  }

  test("kernel smoother: output is a convex combination of the neighbor window") {
    val rows = SparkEntry.queries("ml_kernel_smoother")(spark, dir).collect()
    val byDay = rows.map(r => r.getAs[Long]("date_id") -> r.getAs[Double]("x")).toMap
    rows.foreach { r =>
      val t = r.getAs[Long]("date_id")
      val window = (-7 to 7).flatMap(o => byDay.get(t + o))
      val sm = r.getAs[Double]("smoothed")
      assert(sm >= window.min - 1e-6 && sm <= window.max + 1e-6,
        s"smoothed $sm escapes the neighbor hull at day $t")
      assert(math.abs(r.getAs[Double]("residual") -
        math.rint((r.getAs[Double]("x") - sm) * 1e6) / 1e6) < 1e-9)
    }
  }

  test("var(1): click equation coefficients equal the unrestricted OLS fit") {
    val rows = SparkEntry.queries("ml_var_forecast")(spark, dir)
      .collect().map(r => r.getAs[String]("equation") -> r).toMap
    val ser = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket")
      .agg(round(avg(when(col("event_type") === "click", col("value"))), 6).as("a"),
        round(avg(when(col("event_type") === "purchase", col("value"))), 6).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .orderBy("bucket").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val y = ser.drop(1).map(_._1)
    val y1 = ser.dropRight(1).map(_._1); val x1 = ser.dropRight(1).map(_._2)
    def mean(v: Array[Double]) = v.sum / v.length
    val (my, m1, m2) = (mean(y), mean(y1), mean(x1))
    def dot(u: Array[Double], mu: Double, v: Array[Double], mv: Double) =
      u.zip(v).map { case (p, q) => (p - mu) * (q - mv) }.sum
    val c11 = dot(y1, m1, y1, m1); val c22 = dot(x1, m2, x1, m2)
    val c12 = dot(y1, m1, x1, m2)
    val cy1 = dot(y, my, y1, m1); val cy2 = dot(y, my, x1, m2)
    val det = c11 * c22 - c12 * c12
    val b1 = (cy1 * c22 - cy2 * c12) / det
    val b2 = (cy2 * c11 - cy1 * c12) / det
    val c0 = my - b1 * m1 - b2 * m2
    val click = rows("click")
    assert(math.abs(click.getAs[Double]("coef_click_lag") - b1) < 1e-4)
    assert(math.abs(click.getAs[Double]("coef_purchase_lag") - b2) < 1e-4)
    assert(math.abs(click.getAs[Double]("intercept") - c0) < 1e-3)
    // forecast consistency at the last observed pair
    val (la, lb) = ser.last
    assert(math.abs(click.getAs[Double]("forecast_next") -
      (c0 + b1 * la + b2 * lb)) < 1e-3)
    assert(rows("purchase").getAs[Long]("n") == y.length)
  }

  test("stl anomalies: every emitted row clears 3 robust sigmas, and few do") {
    val rows = SparkEntry.queries("ts_anomaly_stl")(spark, dir).collect()
    rows.foreach(r => assert(math.abs(r.getAs[Double]("z")) > 3.0))
    val nBuckets = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(expr("ts_ns div 1800000000000L").as("bk")).distinct().count()
    assert(rows.length <= nBuckets / 10,
      s"${rows.length} anomalies out of $nBuckets buckets — threshold too loose")
  }

  test("bootstrap ci: deterministic, ordered, and centered near the point mean") {
    val q = SparkEntry.queries("ml_bootstrap_ci")
    val a = q(spark, dir).head()
    val b = q(spark, dir).head()
    assert(a == b, "LCG resampling must be bit-deterministic across runs")
    val (lo, hi) = (a.getAs[Double]("ci_lo"), a.getAs[Double]("ci_hi"))
    val se = a.getAs[Double]("boot_se")
    assert(lo < hi && se > 0)
    val m = a.getAs[Double]("mean")
    assert(m > lo - 4 * se && m < hi + 4 * se,
      s"point mean $m implausibly far from [$lo, $hi] (se=$se)")
    assert(a.getAs[Long]("n_replicates") == 200)
  }

  test("periodogram: nonnegative powers, descending, and stable row count") {
    val rows = SparkEntry.queries("ts_periodogram")(spark, dir).collect()
    assert(rows.length == 10)
    val powers = rows.map(_.getAs[Double]("power"))
    assert(powers.forall(_ >= 0.0))
    assert(powers.sameElements(powers.sortBy(-_)), "rows must be power-ordered")
    rows.foreach(r => assert(r.getAs[Int]("period") >= 2 &&
      r.getAs[Int]("period") <= 96))
  }

  test("ccf: bounded by 1, and lag 0 equals the Pearson correlation") {
    val rows = SparkEntry.queries("ml_ccf")(spark, dir).collect()
    assert(rows.length == 25)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("ccf")) <= 1.0 + 1e-9))
    val ccf0 = rows.find(_.getAs[Int]("lag_buckets") == 0).get.getAs[Double]("ccf")
    val ser = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket")
      .agg(round(avg(when(col("event_type") === "click", col("value"))), 6).as("a"),
        round(avg(when(col("event_type") === "purchase", col("value"))), 6).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val pearson = ser.agg(corr(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(ccf0 - pearson) < 1e-4,
      s"ccf(0)=$ccf0 must equal Pearson corr $pearson")
  }

  test("forecast combination: weights sum to 1 and the blend is never worst") {
    val rows = SparkEntry.queries("ml_forecast_combination")(spark, dir)
      .collect().map(r => r.getAs[String]("model") ->
        ((r.getAs[Double]("weight"), r.getAs[Double]("test_rmse")))).toMap
    val members = Seq("naive", "snaive", "drift")
    val wSum = members.map(rows(_)._1).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"member weights sum to $wSum")
    members.foreach(m => assert(rows(m)._1 > 0.0 && rows(m)._1 < 1.0))
    val worst = members.map(rows(_)._2).max
    assert(rows("combined")._2 <= worst + 1e-9,
      "the inverse-MSE blend cannot be strictly worse than every member")
  }

  test("kruskal-wallis: nonnegative H, tie correction only inflates") {
    val r = SparkEntry.queries("stat_kruskal_wallis")(spark, dir).head()
    assert(r.getAs[Long]("k_groups") == 5)
    val h = r.getAs[Double]("h_stat")
    assert(h >= 0.0)
    assert(r.getAs[Double]("h_corrected") >= h - 1e-9,
      "tie correction divides by a factor <= 1")
  }

  test("jarque-bera: moments match a driver recomputation from raw returns") {
    val out = SparkEntry.queries("stat_jarque_bera")(spark, dir).head()
    val dx = {
      val px = Tables.events(spark, dir).filter(col("event_type") === "click")
        .withColumn("bucket", expr("ts_ns div 1800000000000L"))
        .groupBy("bucket").agg(round(avg(col("value")), 6).as("px"))
        .orderBy("bucket").collect().map(_.getDouble(1))
      px.indices.drop(1).map(i => math.rint((px(i) - px(i - 1)) * 1e6) / 1e6)
    }
    val n = dx.length
    val m = dx.sum / n
    def cm(p: Int) = dx.map(v => math.pow(v - m, p)).sum / n
    val skew = cm(3) / math.pow(cm(2), 1.5)
    val ek = cm(4) / (cm(2) * cm(2)) - 3.0
    assert(out.getAs[Long]("n") == n)
    assert(math.abs(out.getAs[Double]("skewness") - skew) < 1e-4)
    assert(math.abs(out.getAs[Double]("excess_kurtosis") - ek) < 1e-4)
    val jb = n / 6.0 * (skew * skew + ek * ek / 4.0)
    assert(math.abs(out.getAs[Double]("jb_stat") - jb) < 1e-2)
  }

  test("runs test: run count matches a direct scan of the sign sequence") {
    val out = SparkEntry.queries("stat_runs_test")(spark, dir).head()
    val px = Tables.events(spark, dir).filter(col("event_type") === "click")
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket").agg(round(avg(col("value")), 6).as("px"))
      .orderBy("bucket").collect().map(_.getDouble(1))
    val signs = px.indices.drop(1)
      .map(i => if (math.rint((px(i) - px(i - 1)) * 1e6) / 1e6 > 0) 1 else 0)
    val runs = 1 + signs.sliding(2).count { case Seq(a, b) => a != b }
    assert(out.getAs[Long]("runs") == runs)
    assert(out.getAs[Long]("n_pos") == signs.count(_ == 1))
    assert(out.getAs[Long]("n") == signs.length)
  }

  test("hurst: constant slope column matches the 5-point closed form; R/S grows") {
    val rows = SparkEntry.queries("ml_hurst")(spark, dir)
      .orderBy("block_size").collect()
    // block sizes without a single full block drop out (sf0.001 has ~180
    // buckets, so 256 is absent there; sf0.01+ yields all five)
    assert(rows.length >= 3 && rows.length <= 5)
    val rs = rows.map(_.getAs[Double]("mean_rs"))
    rs.sliding(2).foreach { case Array(a, b) =>
      assert(b > a, "rescaled range must grow with block size") }
    val hs = rows.map(_.getAs[Double]("hurst")).distinct
    assert(hs.length == 1, "hurst must be one constant column")
    assert(hs.head > 0.0 && hs.head < 1.0)
    // independent slope recomputation
    val pts = rows.map(r => (math.log(r.getAs[Int]("block_size").toDouble),
      math.log(r.getAs[Double]("mean_rs"))))
    val k = pts.length
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val h = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(hs.head - h) < 1e-5)
  }

  // ---- graph + aggregation -----------------------------------------

  test("triangles: count matches a brute-force set check on the same edges") {
    val out = SparkEntry.queries("graph_triangles")(spark, dir).head()
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = b.as("b1").join(b.as("b2"),
        col("b1.o") === col("b2.o") && col("b1.p") < col("b2.p"))
      .groupBy(col("b1.p").as("pa"), col("b2.p").as("pb"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("pa", "pb").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val eset = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var brute = 0L
    for {
      (a, bNode) <- edges
      c <- nodes if c > bNode
      if eset.contains((a, c)) && eset.contains((bNode, c))
    } brute += 1
    assert(out.getAs[Long]("n_triangles") == brute,
      s"degree-ordered count ${out.getAs[Long]("n_triangles")} vs brute $brute")
    assert(out.getAs[Long]("n_edges") == edges.length)
    assert(out.getAs[Long]("n_nodes") == nodes.length)
    val cl = out.getAs[Double]("clustering")
    assert(cl >= 0.0 && cl <= 1.0 + 1e-9)
  }

  test("count-min: one-sided error law holds and the top token recounts exactly") {
    val rows = SparkEntry.queries("agg_countmin_topk")(spark, dir).collect()
    assert(rows.length == 15)
    val totalTokens = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tk")).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        "CMS estimates can only overcount (one-sided error)")
      assert(r.getAs[Long]("cms_estimate") ==
        r.getAs[Long]("true_count") + r.getAs[Long]("overcount"))
      assert(r.getAs[Long]("cms_estimate") <= totalTokens,
        "no counter can exceed the stream length")
    }
    // independent recount of the most frequent token
    val top = rows.head
    val direct = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tk"))
      .filter(col("tk") === top.getAs[String]("token")).count()
    assert(direct == top.getAs[Long]("true_count"))
  }

  test("scd2: versions chain per user — one current row, intervals abut") {
    val rows = SparkEntry.queries("scd2_history")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"),
        r.getAs[Long]("valid_from_us"),
        Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.toLong),
        r.getAs[Boolean]("is_current")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._3)
      assert(sorted.count(_._5) == 1, s"user $u must have exactly one current row")
      assert(sorted.last._5 && sorted.last._4.isEmpty,
        s"user $u: the last version is the open/current one")
      sorted.sliding(2).foreach {
        case Array((_, v1, _, Some(to1), _), (_, v2, from2, _, _)) =>
          assert(to1 == from2, s"user $u: intervals must abut")
          assert(v1 != v2, s"user $u: consecutive versions must differ")
        case _ => ()
      }
    }
  }

  test("seasonal strength: both measures in [0,1]; n matches the STL support") {
    val r = SparkEntry.queries("ml_seasonal_strength")(spark, dir).head()
    val (st, ss) = (r.getAs[Double]("strength_trend"),
      r.getAs[Double]("strength_seasonal"))
    assert(st >= 0.0 && st <= 1.0, s"strength_trend $st")
    assert(ss >= 0.0 && ss <= 1.0, s"strength_seasonal $ss")
    val stlRows = SparkEntry.queries("ts_stl_decompose")(spark, dir)
      .filter(col("event_type") === "click").count()
    assert(r.getAs[Long]("n") == stlRows,
      "strength must be computed over the same complete-window support as the STL")
  }

  test("partial merge: every per-type row reports consistent = true") {
    val rows = SparkEntry.queries("agg_partial_merge")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("consistent"),
      s"merged != direct for ${r.getAs[String]("event_type")}"))
    assert(rows.forall(_.getAs[Long]("n_partials") > 0))
  }
}
