package graft

/** Laws for the round-9 wave (`queries/R9.scala`). The oracle gate
  * hash-checks the four SQL-expressible entries; these tests pin the
  * properties the gate cannot see — above all the portfolio optimality
  * laws for the rows-only `fin_min_variance_portfolio`. */
class R9Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("min-variance portfolio: weights sum to 1 and dominate equal weight") {
    val rows = SparkEntry.queries("fin_min_variance_portfolio")(spark, dir)
      .collect()
    assert(rows.length >= 2, "expected one row per series")
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights must sum to 1, got $wsum")
    val pv = rows.head.getAs[Double]("port_variance")
    val ev = rows.head.getAs[Double]("equal_weight_variance")
    assert(pv <= ev + 1e-12,
      s"GMV variance $pv must not exceed equal-weight variance $ev")
    assert(pv > 0.0, "portfolio variance must be positive")
  }

  test("min-variance portfolio: KKT stationarity — covariance times w is constant") {
    // w = Σ⁻¹1/(1ᵀΣ⁻¹1) ⟺ Σw = λ·1: recompute Σ from the same bars and
    // check Σw has (near-)equal components. Tolerance reflects the 1e-6
    // rounding of the published weights.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val wOrd = Window.partitionBy("event_type").orderBy("bucket")
    val bars = Tables.events(spark, dir)
      .withColumn("bucket", expr("ts_ns div 21600000000000L"))
      .groupBy("event_type", "bucket").agg(round(avg(col("value")), 6).as("px"))
      .withColumn("r", round(log(col("px") / lag(col("px"), 1).over(wOrd)), 6))
      .filter(col("r").isNotNull)
    val types = bars.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted
    val wide = bars.groupBy("bucket").pivot("event_type", types)
      .agg(first(col("r"))).na.drop("any")
      .collect().map(r => types.indices.map(i => r.getDouble(i + 1)).toArray)
    val k = types.length
    val n = wide.length.toDouble
    val mean = Array.tabulate(k)(i => wide.map(_(i)).sum / n)
    val cov = Array.tabulate(k, k) { (i, j) =>
      wide.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n }
    val weights = SparkEntry.queries("fin_min_variance_portfolio")(spark, dir)
      .orderBy("series").collect().map(_.getAs[Double]("weight"))
    val sw = Array.tabulate(k)(i =>
      (0 until k).map(j => cov(i)(j) * weights(j)).sum)
    val lam = sw.sum / k
    // components of Σw must agree with their mean to weight-rounding scale
    sw.foreach(v => assert(math.abs(v - lam) <= 5e-6 * math.max(1.0, math.abs(lam) / 1e-6),
      s"KKT violated: sigma*w components ${sw.toSeq} not constant"))
  }

  test("bottom-k quantile sketch: sample estimates track exact quantiles") {
    val rows = SparkEntry.queries("agg_quantile_bottomk")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val spreadBound = {
        // per series, the p90-p10 exact spread bounds plausible error
        val tp = r.getAs[String]("event_type")
        val span = rows.filter(_.getAs[String]("event_type") == tp)
        span.map(_.getAs[Double]("exact_q")).max -
          span.map(_.getAs[Double]("exact_q")).min
      }
      assert(r.getAs[Double]("abs_err") <= math.max(spreadBound, 1e-6),
        s"sample estimate too far from exact: $r")
    }
  }

  test("isotonic calibration: monotone, mass-preserving, never worse than raw in weighted MSE") {
    val rows = SparkEntry.queries("ml_isotonic_calibration")(spark, dir)
      .orderBy("k").collect()
    assert(rows.length >= 10, "expected one row per payload-k level")
    val cal = rows.map(_.getAs[Double]("calibrated_rate"))
    // PAVA's defining property: non-decreasing in the feature
    cal.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-9, s"calibrated rates must be monotone: ${cal.toSeq}") }
    // pooled-mean law: weighted prediction mass equals weighted label mass
    val wts = rows.map(_.getAs[Long]("n").toDouble)
    val raw = rows.map(_.getAs[Double]("raw_rate"))
    val massRaw = wts.zip(raw).map { case (w, r) => w * r }.sum
    val massCal = wts.zip(cal).map { case (w, r) => w * r }.sum
    assert(math.abs(massRaw - massCal) <= 1e-3 * math.max(1.0, massRaw),
      s"PAVA must preserve weighted mass: raw=$massRaw cal=$massCal")
    // the monotone fit is the weighted L2 projection: its weighted MSE
    // against the raw rates is minimal among monotone fits, in particular
    // no worse than the best CONSTANT fit
    val mean = massRaw / wts.sum
    val mseCal = wts.zip(raw.zip(cal)).map { case (w, (r, c)) =>
      w * (r - c) * (r - c) }.sum
    val mseConst = wts.zip(raw).map { case (w, r) =>
      w * (r - mean) * (r - mean) }.sum
    assert(mseCal <= mseConst + 1e-9,
      s"isotonic fit must beat the constant fit: $mseCal vs $mseConst")
  }

  test("permutation FDR: p-values valid, BH rejection set is a prefix of the p-ranking") {
    val rows = SparkEntry.queries("stat_permutation_fdr")(spark, dir)
      .orderBy("p_rank").collect()
    assert(rows.length >= 3, "expected one row per series pair")
    rows.foreach { r =>
      val p = r.getAs[Double]("p_value")
      assert(p > 0.0 && p <= 1.0, s"p-value out of range: $r")
    }
    val rejects = rows.map(_.getAs[Boolean]("reject_fdr10"))
    // BH step-up: rejections form a prefix in p-rank order
    val firstAccept = rejects.indexOf(false)
    if (firstAccept >= 0)
      assert(rejects.drop(firstAccept).forall(!_),
        s"BH rejection set must be a p-rank prefix: ${rejects.toSeq}")
  }
}
