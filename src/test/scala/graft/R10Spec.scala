package graft

import org.apache.spark.sql.functions._

/** Laws for the round-10 wave (`queries/R10.scala`). The oracle gate
  * hash-checks `fin_gmv_audit` and `ml_ensemble_grouped`; these tests pin
  * what the gate cannot see — agreement of the fixed-iteration GMV solve
  * with the direct Gaussian-elimination solve, and closed-form recovery
  * of a planted AR(2) by the grouped ensemble. */
class R10Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("gmv audit: weights sum to 1, gradient residual small, GMV dominates") {
    val rows = SparkEntry.queries("fin_gmv_audit")(spark, dir)
      .orderBy("series").collect()
    assert(rows.length >= 2)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-5, s"weights must sum to 1, got $wsum")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("grad_residual")) < 0.05,
        s"fixed-iteration solve did not converge: residual " +
          s"${r.getAs[Double]("grad_residual")} for ${r.getAs[String]("series")}")
    }
    val pv = rows.head.getAs[Double]("port_variance_bp")
    val ev = rows.head.getAs[Double]("equal_weight_variance_bp")
    assert(pv > 0.0 && pv <= ev + 1e-9,
      s"GMV variance $pv must not exceed equal-weight variance $ev")
    assert(rows.head.getAs[Long]("n_iter") == 400L)
  }

  test("gmv audit: fixed-iteration weights agree with the direct solve") {
    // the same minimization solved two ways — Gaussian elimination
    // (fin_min_variance_portfolio) vs the contraction iteration
    // (fin_gmv_audit); both at sf0.001, per-series agreement
    val direct = SparkEntry.queries("fin_min_variance_portfolio")(spark, dir)
      .orderBy("series").collect()
      .map(r => r.getAs[String]("series") -> r.getAs[Double]("weight")).toMap
    val iter = SparkEntry.queries("fin_gmv_audit")(spark, dir)
      .orderBy("series").collect()
      .map(r => r.getAs[String]("series") -> r.getAs[Double]("weight")).toMap
    assert(direct.keySet == iter.keySet)
    direct.foreach { case (g, wd) =>
      assert(math.abs(wd - iter(g)) < 0.02,
        s"$g: direct $wd vs iterative ${iter(g)}")
    }
  }

  test("grouped ensemble: member weights normalize, error metrics are lawful") {
    val rows = SparkEntry.queries("ml_ensemble_grouped")(spark, dir).collect()
    assert(rows.length >= 2, "expected one row per series")
    rows.foreach { r =>
      val (wo, wr) = (r.getAs[Double]("w_ols"), r.getAs[Double]("w_ridge"))
      assert(wo >= 0.0 && wr >= 0.0 && math.abs(wo + wr - 1.0) < 2e-6,
        s"weights must normalize: $wo + $wr")
      val (mae, rmse) = (r.getAs[Double]("mae"), r.getAs[Double]("rmse"))
      assert(mae >= 0.0 && rmse + 1e-9 >= mae,
        s"RMSE $rmse must dominate MAE $mae")
      val da = r.getAs[Double]("dir_acc")
      assert(da >= 0.0 && da <= 1.0)
      assert(r.getAs[Double]("r2_test") <= 1.0)
      assert(r.getAs[Long]("n_train") > r.getAs[Long]("n_test"))
      assert(r.getAs[Long]("n_test") > 0)
    }
  }

  test("lasso CD: orthonormal design gives the soft-threshold closed form") {
    // with G = n·I the coordinates decouple and one sweep lands each
    // β_j on S(ρ_j, λ)/n exactly — the textbook lasso fixed point
    val n = 100.0
    val k = 5
    val gm = Array.tabulate(k, k)((i, j) => if (i == j) n else 0.0)
    val xty = Array(250.0, -30.0, 5.0, -5.0, 120.0)
    val lam = 10.0
    val beta = graft.queries.R10.lassoCd(gm, xty, lam, steps = 60 * k)
    val expect = xty.map { r =>
      if (r > lam) (r - lam) / n else if (r < -lam) (r + lam) / n else 0.0
    }
    beta.zip(expect).zipWithIndex.foreach { case ((b, e), i) =>
      assert(math.abs(b - e) < 1e-9, s"coord $i: $b vs $e")
    }
    // the correlation-threshold behavior: |xty| <= lam coordinates are 0
    assert(beta(2) == 0.0 && beta(3) == 0.0)
  }

  test("ml_lasso_cd: registered query emits the widened lasso schema, lawful") {
    val rows = SparkEntry.queries("ml_lasso_cd")(spark, dir).collect()
    assert(rows.length == 6)
    val byF = rows.map(r => r.getString(0) ->
      (r.getAs[Double]("coef_std"), r.getAs[Double]("coefficient"))).toMap
    assert(byF.contains("__intercept"))
    assert(byF("__intercept")._1 == 0.0)
    byF.foreach { case (f, (cs, c)) =>
      assert(!cs.isNaN && !c.isNaN && math.abs(c) < 1e6, s"$f: $cs / $c")
    }
  }

  test("label propagation: coarsening trajectory is monotone and node-conserving") {
    val rows = SparkEntry.queries("graph_label_propagation")(spark, dir)
      .orderBy("iter").collect()
    assert(rows.length == 4, "one census row per LPA round")
    val comm = rows.map(_.getAs[Long]("n_communities")).toSeq
    val largest = rows.map(_.getAs[Long]("largest_size")).toSeq
    // sync-LPA with self-loops coarsens on this graph: community count
    // never increases round-over-round, the giant component only grows
    comm.sliding(2).foreach { case Seq(a, b) => assert(b <= a, s"$comm") }
    largest.sliding(2).foreach { case Seq(a, b) => assert(b >= a, s"$largest") }
    rows.foreach(r => assert(r.getAs[Long]("largest_size") >= 1L &&
      r.getAs[Long]("n_communities") >= 1L))
  }

  test("huber IRLS: planted outliers pull OLS but not the robust fit") {
    import spark.implicits._
    // y = 2 + 0.5x exactly, except 4 gross outliers — iteration 0 (OLS)
    // must be dragged, iteration 4 must sit near the true slope
    val rows = (0 until 200).flatMap { b =>
      val x = 100.0 + (b % 50)
      val y = 2.0 + 0.5 * x + (if (b % 50 == 7 && b < 200 && b % 100 < 50) 300.0 else 0.0)
      Seq(("purchase", b.toLong * 21600000000000L, x),
        ("click", b.toLong * 21600000000000L, y))
    }
    val df = rows.toDF("event_type", "ts_ns", "value")
    df.createOrReplaceTempView("r10_huber_planted")
    try {
      val out = spark.sql(graft.queries.R10.huberIrlsSql(
          "r10_huber_planted", "ts_ns div 21600000000000",
          "percentile(abs(r), 0.5)"))
        .orderBy("iter").collect()
      assert(out.length == 5)
      val b0 = out.head.getAs[Double]("beta")
      val b4 = out.last.getAs[Double]("beta")
      assert(math.abs(b4 - 0.5) < math.abs(b0 - 0.5) / 2,
        s"IRLS must robustify: ols $b0 vs huber $b4")
      assert(math.abs(b4 - 0.5) < 0.05, s"robust slope $b4 should be ~0.5")
      assert(out.last.getAs[Long]("n_outliers") > 0L)
    } finally { spark.catalog.dropTempView("r10_huber_planted"); () }
  }

  test("kmeans lloyd: partition is exhaustive, centroids finite, WCSS lawful") {
    val rows = SparkEntry.queries("ml_kmeans_lloyd")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val total = rows.map(_.getAs[Long]("n_points")).sum
    // every point lands in exactly one cluster (windowed argmin rn=1)
    import org.apache.spark.sql.functions._
    val nPts = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket")
      .agg(sum(when(col("event_type") === "click", 1)).as("c"),
        sum(when(col("event_type") === "purchase", 1)).as("p"))
      .filter(col("c").isNotNull && col("p").isNotNull).count()
    assert(total == nPts, s"partition must cover all $nPts points, got $total")
    rows.foreach { r =>
      assert(!r.getAs[Double]("cx").isNaN && !r.getAs[Double]("cy").isNaN)
      assert(r.getAs[Double]("wcss") >= 0.0)
    }
  }

  test("pca power: orthonormal components, ordered positive spectrum") {
    val rows = SparkEntry.queries("ml_pca_power")(spark, dir)
      .orderBy("component", "feature").collect()
    assert(rows.length == 10)
    val v1 = rows.take(5).map(_.getAs[Double]("loading"))
    val v2 = rows.drop(5).map(_.getAs[Double]("loading"))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(v1, v1) - 1.0) < 1e-3, s"PC1 norm ${dot(v1, v1)}")
    assert(math.abs(dot(v2, v2) - 1.0) < 1e-3, s"PC2 norm ${dot(v2, v2)}")
    assert(math.abs(dot(v1, v2)) < 1e-2, s"PC1·PC2 = ${dot(v1, v2)}")
    val l1 = rows.head.getAs[Double]("eigenvalue")
    val l2 = rows.last.getAs[Double]("eigenvalue")
    assert(l1 >= l2 && l2 > 0.0, s"spectrum $l1, $l2")
    val e1 = rows.head.getAs[Double]("explained_ratio")
    val e2 = rows.last.getAs[Double]("explained_ratio")
    assert(e1 + e2 <= 1.0 + 1e-6 && e1 >= e2)
  }

  test("holt-winters filter: one finite row with lawful error metrics") {
    val r = SparkEntry.queries("ml_holt_winters_filter")(spark, dir).head()
    assert(r.getAs[Long]("n_obs") > 96L)
    assert(r.getAs[Double]("rmse") >= 0.0)
    Seq("level", "trend", "forecast_1", "forecast_1day").foreach { c =>
      assert(!r.getAs[Double](c).isNaN && !r.getAs[Double](c).isInfinite, c)
    }
  }

  test("grouped ensemble: recovers a planted noiseless AR(2) per series") {
    import spark.implicits._
    // two series, each y_t = c + a·y_{t-1} + b·y_{t-2} exactly, values on
    // the 1e-2 grid via rounding — the OLS member must fit near-exactly
    // and the blend inherit it (test R² ≈ 1, tiny RMSE)
    // complex AR roots (damped oscillation) + a displaced start so the
    // training window carries real dynamics instead of a fixed point
    def series(g: String, c: Double, a: Double, b: Double): Seq[(String, Long, Double)] = {
      var (y1, y2) = (150.0, 100.0)
      (0 until 240).map { t =>
        val y = math.rint((c + a * y1 + b * y2) * 100) / 100
        y2 = y1; y1 = y
        (g, t.toLong * 1800000000000L, y)
      }
    }
    val df = (series("s1", 33.0, 1.6, -0.93) ++ series("s2", 30.0, 1.2, -0.5))
      .toDF("event_type", "ts_ns", "value")
    df.createOrReplaceTempView("r10_planted")
    try {
      val out = spark.sql(graft.queries.R10.groupedEnsembleSql(
          "r10_planted", "ts_ns div 1800000000000", "event_type", ""))
        .collect()
      assert(out.length == 2)
      out.foreach { r =>
        assert(r.getAs[Double]("rmse") < 0.5,
          s"planted AR(2) not recovered: rmse ${r.getAs[Double]("rmse")} " +
            s"for ${r.getAs[String]("series")}")
        assert(r.getAs[Double]("r2_train_ols") > 0.9)
      }
    } finally { spark.catalog.dropTempView("r10_planted"); () }
  }

  test("logistic newton: planted separation drives accuracy up, log-loss down") {
    import spark.implicits._
    // purchase = 100 exactly when x1 >= 75 (else 10), so the label the
    // query derives (purchase > median) is x1-separable; x2 is noise
    val rows = (0 until 200).flatMap { b =>
      val x1 = 50.0 + (b % 100) * 0.5
      val x2 = 60.0 + (b % 7)
      val pv = if (x1 >= 75.0) 100.0 else 10.0
      Seq(("click", b.toLong * 1800000000000L, x1),
        ("view", b.toLong * 1800000000000L, x2),
        ("purchase", b.toLong * 1800000000000L, pv))
    }
    val df = rows.toDF("event_type", "ts_ns", "value")
    df.createOrReplaceTempView("r10_logit_planted")
    try {
      val out = spark.sql(graft.queries.R10.logisticNewtonSql(
          "r10_logit_planted", "ts_ns div 1800000000000",
          "percentile(p_raw, 0.5)", ""))
        .orderBy("iter").collect()
      assert(out.length == 5)
      val first = out.head; val last = out.last
      assert(first.getAs[Double]("log_loss") > last.getAs[Double]("log_loss"),
        "Newton steps must reduce training log-loss on separable data")
      assert(last.getAs[Double]("beta1") > 0.0,
        "the separating feature must get a positive weight")
      assert(last.getAs[Long]("n_correct") >= 190L,
        s"separable data should classify nearly perfectly, " +
          s"got ${last.getAs[Long]("n_correct")}/200")
    } finally { spark.catalog.dropTempView("r10_logit_planted"); () }
  }

  test("gbt stumps: planted two-cluster target found at the exact threshold, geometric SSE decay") {
    import spark.implicits._
    // x in {10, 100}, y constant within cluster: the best stump is the
    // cluster boundary; with nu = 0.5 and piecewise-constant residuals the
    // leaf values absorb exactly half the residual each round, so SSE
    // contracts by 0.25 per iteration until grid rounding bites
    val rows = (0 until 200).flatMap { b =>
      val x = if (b % 2 == 0) 10.0 else 100.0
      val y = if (b % 2 == 0) 5.0 else 50.0
      Seq(("click", b.toLong * 1800000000000L, x),
        ("purchase", b.toLong * 1800000000000L, y))
    }
    val df = rows.toDF("event_type", "ts_ns", "value")
    df.createOrReplaceTempView("r10_gbt_planted")
    try {
      val out = spark.sql(graft.queries.R10.gbtStumpsSql(
          "r10_gbt_planted", "ts_ns div 1800000000000", ""))
        .orderBy("iter").collect()
      assert(out.length == 7)
      val sses = out.map(_.getAs[Double]("train_sse"))
      assert(sses.sliding(2).forall { case Array(a, b) => b <= a + 1e-9 },
        s"boosting SSE must be non-increasing: ${sses.mkString(",")}")
      out.drop(1).foreach { r =>
        assert(r.getAs[Double]("threshold") == 10.0,
          s"stump must split at the cluster boundary, " +
            s"got ${r.getAs[Double]("threshold")}")
      }
      val ratio = sses(1) / sses(0)
      assert(math.abs(ratio - 0.25) < 0.01,
        s"first boosting round should contract SSE by ~0.25, got $ratio")
    } finally { spark.catalog.dropTempView("r10_gbt_planted"); () }
  }

  test("dbscan: registered query matches a brute-force driver DBSCAN") {
    import spark.implicits._
    val eps = 3.0; val minPts = 5
    // sf0.01: ~800 points, enough for non-trivial cluster structure
    // (sf0.001 yields only ~26 joint buckets); brute force is O(n²) driver
    val bfDir = "/root/testdata/sf0.01"
    // the same point frame the query builds, collected (test-sized)
    val pts = graft.Tables.events(spark, bfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket")
      .agg(graft.queries.Grid.mean6(when(col("event_type") === "click", col("value"))).as("x"),
        graft.queries.Grid.mean6(when(col("event_type") === "purchase", col("value"))).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val n = pts.length
    assert(n > 100)
    val nbr = Array.tabulate(n) { i =>
      (0 until n).filter { j =>
        val dx = pts(i)._2 - pts(j)._2; val dy = pts(i)._3 - pts(j)._3
        dx * dx + dy * dy <= eps * eps
      }
    }
    val isCore = (0 until n).map(i => nbr(i).length >= minPts)
    // union-find over core-core edges
    val parent = Array.tabulate(n)(identity)
    def find(a: Int): Int = { var x = a; while (parent(x) != x) x = parent(x); x }
    for (i <- 0 until n if isCore(i); j <- nbr(i) if isCore(j)) {
      val (a, b) = (find(i), find(j))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    // component label = min BUCKET id among member cores (the query's rule)
    val compOf = scala.collection.mutable.Map[Int, Long]()
    for (i <- 0 until n if isCore(i)) {
      val r = find(i)
      compOf(r) = math.min(compOf.getOrElse(r, Long.MaxValue), pts(i)._1)
    }
    val label = (0 until n).map { i =>
      if (isCore(i)) compOf(find(i))
      else {
        val coreN = nbr(i).filter(isCore)
        if (coreN.nonEmpty) coreN.map(j => compOf(find(j))).min else -1L
      }
    }
    val wantSizes = label.zipWithIndex.groupBy(_._1).map { case (c, m) =>
      (c, m.size, m.count(p => isCore(p._2)))
    }.toSet
    val got = SparkEntry.queries("ml_dbscan_grid")(spark, bfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3).toInt, r.getLong(1).toInt)).toSet
    assert(got == wantSizes,
      s"distributed DBSCAN must equal brute force:\ngot  $got\nwant $wantSizes")
  }

  test("logrank: planted weekend-longer sessions reject decisively") {
    import spark.implicits._
    val day = 86400000000000L // ns
    val satBase = 7002L * day // epoch day ≡ 2 mod 7 → Saturday
    val monBase = 7004L * day // Monday
    var eid = 0L
    val rows = ((0 until 100).flatMap { k =>
      eid += 2
      // weekend session: two events 9 min apart (duration 9 min)
      // 20-min spacing keeps all 100 sessions inside Sat+Sun (33 h span)
      Seq((1000L + k, eid - 1, satBase + k * 1200000000000L),
        (1000L + k, eid, satBase + k * 1200000000000L + 540000000000L))
    } ++ (0 until 100).map { k =>
      eid += 1
      // weekday session: a single event (duration 0)
      (2000L + k, eid, monBase + k * 1200000000000L)
    } :+ ((9999L, eid + 1, monBase + 30L * day))) // far sentinel: censors itself
    val df = rows.toDF("user_id", "event_id", "ts_ns")
    df.createOrReplaceTempView("r10_logrank_planted")
    try {
      val out = spark.sql(graft.queries.R10.logrankSql(
        "r10_logrank_planted", "ts_ns div 1000", "div")).head()
      assert(out.getAs[Long]("n_sessions_weekend") == 100L)
      assert(out.getAs[Long]("n_sessions_weekday") == 101L)
      assert(out.getAs[Long]("n_censored") == 1L)
      assert(out.getAs[Double]("chi2") > 50.0,
        s"planted duration gap must be decisive, chi2 ${out.getAs[Double]("chi2")}")
      assert(out.getAs[Long]("reject_95") == 1L)
    } finally { spark.catalog.dropTempView("r10_logrank_planted"); () }
  }

  test("gbt stumps on data: SSE strictly decreases and leaves are finite") {
    val out = SparkEntry.queries("ml_gbt_stumps")(spark, dir)
      .orderBy("iter").collect()
    assert(out.length == 7)
    val sses = out.map(_.getAs[Double]("train_sse"))
    assert(sses.sliding(2).forall { case Array(a, b) => b <= a },
      s"SSE must not increase: ${sses.mkString(",")}")
    out.foreach { r =>
      assert(!r.getAs[Double]("left_val").isNaN &&
        !r.getAs[Double]("right_val").isNaN)
    }
  }
}
