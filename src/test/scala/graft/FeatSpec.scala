package graft

import org.apache.spark.sql.functions._

/** Independent driver-side cross-checks for the feature-engineering /
  * model-prep pack (`queries/Feat.scala`). The DuckDB oracle pins
  * cross-engine value equality for every query; these tests re-derive
  * the statistics from raw rows in plain Scala — a second implementation
  * of the same definition — plus structural laws (mass conservation,
  * steady-state convergence, exact-arithmetic p-values) the oracle
  * cannot express.
  */
class FeatSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("lnFactSql matches driver-side ln(x!) within 1e-12 relative for x in 0..80") {
    // lookup region, crossover at 21, and deep Stirling region
    val got = spark.sql(
      s"SELECT x, ${queries.Feat.lnFactSql("x")} AS lf FROM range(0, 81) t(x)")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var want = 0.0
    for (x <- 0 to 80) {
      if (x > 0) want += math.log(x)
      val tol = math.max(1e-12, math.abs(want) * 1e-12)
      assert(math.abs(got(x) - want) <= tol,
        s"ln($x!): got ${got(x)} want $want")
    }
  }

  test("fisher exact p-value equals an exact-rational recomputation") {
    // Exact hypergeometric arithmetic in BigDecimal from BigInt
    // factorials — no logs, no Stirling, no floats until the final
    // division. The engine's Stirling/decimal path must land within
    // the output grid (1e-6) plus the mirror-tie slack.
    val r = SparkEntry.queries("stat_fisher_exact")(spark, dir).head()
    val (a, b, c, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("c"), r.getAs[Long]("d"))
    val (r1, r2, c1) = (a + b, c + d, a + c)
    def fact(n: Long): BigInt = (BigInt(1) to BigInt(n)).product
    def choose(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else fact(n) / (fact(k) * fact(n - k))
    val n = r1 + r2
    val denom = choose(n, c1)
    def prob(x: Long): BigDecimal =
      BigDecimal(choose(r1, x) * choose(r2, c1 - x)) / BigDecimal(denom)
    val lo = math.max(0L, c1 - r2)
    val hi = math.min(r1, c1)
    val pObs = prob(a)
    // exact two-sided: include every table whose exact prob ≤ observed
    // (the 1e-9 engine slack only exists to catch FLOAT mirror ties;
    // exact arithmetic needs no slack)
    val p = (lo to hi).map(prob).filter(_ <= pObs * (1 + BigDecimal("1e-12"))).sum
    assert(math.abs(r.getAs[Double]("p_value") - p.toDouble) < 2e-6,
      s"p: got ${r.getAs[Double]("p_value")} exact ${p.toDouble}")
    assert(r.getAs[Double]("p_value") > 0 && r.getAs[Double]("p_value") <= 1.0)
  }

  test("kalman local-level: exact driver replay per series + steady-state gain") {
    val out = SparkEntry.queries("ts_kalman_level")(spark, dir)
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // steady-state gain of the local-level model: K* solves the Riccati
    // fixed point — K* = (−q + √(q² + 4q)) / 2 for r = 1
    val kStar = (-0.01 + math.sqrt(0.01 * 0.01 + 4 * 0.01)) / 2
    for ((tpe, rows) <- out) {
      val sorted = rows.sortBy(_.getAs[Long]("bucket"))
      var level = 0.0; var p = 0.0
      sorted.zipWithIndex.foreach { case (row, i) =>
        val y = row.getAs[Double]("y")
        val gain =
          if (i == 0) { level = y; p = 1.0; 1.0 }
          else {
            val pp = r9(p + 0.01)
            val kg = r9(pp / (pp + 1.0))
            level = r9(level + kg * (y - level))
            p = r9((1.0 - kg) * pp)
            kg
          }
        assert(row.getAs[Double]("level") == level,
          s"$tpe step $i level: ${row.getAs[Double]("level")} vs $level")
        assert(row.getAs[Double]("gain") == gain)
      }
      // the filter reaches its Riccati fixed point well inside the series
      assert(math.abs(sorted.last.getAs[Double]("gain") - kStar) < 1e-3,
        s"$tpe steady gain ${sorted.last.getAs[Double]("gain")} vs $kStar")
      // filtered level is a convex combination of observations: bounded
      val ys = sorted.map(_.getAs[Double]("y"))
      val lv = sorted.map(_.getAs[Double]("level"))
      assert(lv.max <= ys.max + 1e-9 && lv.min >= ys.min - 1e-9)
    }
  }

  test("woe encoding: cell identities, sign law, and one band re-derived") {
    val rows = SparkEntry.queries("feature_woe_encode")(spark, dir).collect()
    assert(rows.length == 10)
    val tp = rows.map(_.getAs[Long]("n_pos")).sum.toDouble
    val tn = rows.map(_.getAs[Long]("n_neg")).sum.toDouble
    for (r <- rows) {
      assert(r.getAs[Long]("n") == r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg"))
      val woe = math.log(((r.getAs[Long]("n_pos") + 0.5) / tp) /
        ((r.getAs[Long]("n_neg") + 0.5) / tn))
      assert(approx(r.getAs[Double]("woe"), math.rint(woe * 1e6) / 1e6, 1e-6))
      // sign law on the SAME smoothed shares the WoE divides: a band
      // over-representing (smoothed) positives has positive WoE
      val liftPos = (r.getAs[Long]("n_pos") + 0.5) / tp > (r.getAs[Long]("n_neg") + 0.5) / tn
      if (math.abs(r.getAs[Double]("woe")) > 1e-4)
        assert((r.getAs[Double]("woe") > 0) == liftPos)
    }
  }

  test("hashing trick: mass conservation, bucket range, determinism") {
    val q = SparkEntry.queries("feature_hashing_trick")(spark, dir)
    val rows = q.collect()
    val total = Tables.events(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    assert(rows.forall(r => r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < 32))
    // every distinct (event_type, k) feature lands in exactly one bucket
    val nFeat = Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_features")).sum == nFeat)
    // |signed| ≤ rows per bucket (sign cancellation can only shrink)
    assert(rows.forall(r =>
      math.abs(r.getAs[Long]("signed_count")) <= r.getAs[Long]("n_rows")))
    val again = SparkEntry.queries("feature_hashing_trick")(spark, dir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("schema drift: halves partition the fact and deltas re-derive") {
    val rows = SparkEntry.queries("dq_schema_drift")(spark, dir)
      .collect().map(r => r.getAs[String]("metric") -> r).toMap
    val total = Tables.events(spark, dir).count()
    val nb = rows("n_rows").getAs[Double]("before")
    val na = rows("n_rows").getAs[Double]("after")
    assert((nb + na).toLong == total)
    assert(nb > 0 && na > 0)
    for ((_, r) <- rows) {
      val want = (r.getAs[Double]("after") - r.getAs[Double]("before")) /
        r.getAs[Double]("before")
      assert(approx(r.getAs[Double]("rel_delta"), math.rint(want * 1e6) / 1e6, 1e-6))
    }
  }

  test("degree distribution: handshake identity against the edge count") {
    val rows = SparkEntry.queries("graph_degree_distribution")(spark, dir).collect()
    // rebuild the support-≥2 co-purchase edge set on the driver
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = b.groupBy(_._1).values
    val pairCnt = new scala.collection.mutable.HashMap[(Long, Long), Int]()
    for (grp <- byOrder; x <- grp; y <- grp if x._2 < y._2)
      pairCnt((x._2, y._2)) = pairCnt.getOrElse((x._2, y._2), 0) + 1
    val edges = pairCnt.filter(_._2 >= 2).keys.toSeq
    val sumDeg = rows.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes")).sum
    assert(sumDeg == 2L * edges.length,
      s"handshake: sum(deg*n)=$sumDeg vs 2|E|=${2 * edges.length}")
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
  }

  test("matrix profile: driver brute-force replay for one series") {
    val out = SparkEntry.queries("ts_matrix_profile")(spark, dir)
      .filter(col("event_type") === "purchase").collect()
      .map(r => r.getAs[Int]("idx") ->
        (r.getAs[Int]("nn_idx"), r.getAs[Double]("nn_dist"))).toMap
    assert(out.nonEmpty)
    // rebuild the hourly bar series and compute the exact z-normalized
    // profile in plain doubles (the engine's DECIMAL path must agree to
    // well inside the 1e-6 output grid)
    val ys = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("bucket", expr("ts_ns div 3600000000000L"))
      .groupBy("bucket").agg(round(avg(col("value")), 6).as("y"))
      .orderBy("bucket").collect().map(_.getDouble(1))
    val m = 24
    val nw = ys.length - m + 1
    val stats = (0 until nw).map { i =>
      val w = ys.slice(i, i + m)
      val mu = w.sum / m
      val sig = math.sqrt(math.max(w.map(x => x * x).sum / m - mu * mu, 0.0))
      (mu, sig)
    }
    val valid = (0 until nw).filter(i => stats(i)._2 > 1e-9)
    for (i <- valid) {
      var best = (Double.MaxValue, -1)
      for (j <- valid if math.abs(i - j) >= m / 2) {
        val dot = (0 until m).map(l => ys(i + l) * ys(j + l)).sum
        val d2 = 2.0 * m * (1.0 - (dot - m * stats(i)._1 * stats(j)._1) /
          (m * stats(i)._2 * stats(j)._2))
        val dd = math.sqrt(math.max(d2, 0.0))
        if (dd < best._1 - 1e-9) best = (dd, j)
      }
      val (gotJ, gotD) = out(i + 1) // engine idx is 1-based row_number
      assert(math.abs(gotD - best._1) < 1e-4,
        s"i=$i: dist $gotD vs ${best._1}")
      // nn index must achieve the same minimum (ties may differ by id)
      val dotG = (0 until m).map(l => ys(i + l) * ys(gotJ - 1 + l)).sum
      val dG = math.sqrt(math.max(2.0 * m * (1.0 -
        (dotG - m * stats(i)._1 * stats(gotJ - 1)._1) /
          (m * stats(i)._2 * stats(gotJ - 1)._2)), 0.0))
      assert(math.abs(dG - best._1) < 1e-4)
    }
  }

  test("containment dedup: complete driver re-derivation of the pair set") {
    val rows = SparkEntry.queries("dedup_containment")(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
      .filter(_._2.length >= 5)
    val shingles = docs.map { case (id, toks) =>
      id -> toks.sliding(5).map(_.mkString(" ")).toSet
    }.toMap
    val df = new scala.collection.mutable.HashMap[String, Int]().withDefaultValue(0)
    for ((_, ss) <- shingles; sh <- ss) df(sh) += 1
    val capped = shingles.map { case (id, ss) => id -> ss.filter(df(_) <= 50) }
    val want = (for {
      (a, sa) <- capped; (b, sb) <- capped if a < b
      inter = (sa intersect sb).size
      if inter > 0 && sa.nonEmpty && sb.nonEmpty
      ca = inter.toDouble / sa.size; cb = inter.toDouble / sb.size
      if math.rint(math.max(ca, cb) * 1e6) / 1e6 >= 0.6
    } yield (a, b, inter)).toSet
    val got = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Long]("inter").toInt)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    for (r <- rows) {
      assert(r.getAs[Double]("containment_a") <= 1.0 + 1e-9)
      assert(r.getAs[Double]("containment_b") <= 1.0 + 1e-9)
    }
  }

  test("importance resampling: full driver replay of the DSIR pipeline") {
    val rows = SparkEntry.queries("corpus_importance_resample")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // driver replay: md5-hash buckets, two LMs, per-doc mean log-ratio
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).split(" ", -1).toSeq))
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1024
    }
    val allB = docs.flatMap(d => d._4.map(bucket))
    val tgtB = docs.filter(_._3 == "en").flatMap(d => d._4.map(bucket))
    val cr = allB.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = tgtB.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nr, nt) = (allB.length.toLong, tgtB.length.toLong)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val lam = cr.keys.map { b =>
      b -> r6(math.log(((ct.getOrElse(b, 0L) + 0.5) / (nt + 0.5 * 1024)) /
        ((cr(b) + 0.5) / (nr + 0.5 * 1024))))
    }.toMap
    val scores = docs.map { case (_, src, _, toks) =>
      val s = toks.map(t => lam(bucket(t))).sum
      src -> r6((s / toks.length).toDouble)
    }
    for ((src, grp) <- scores.groupBy(_._1)) {
      val r = rows(src)
      assert(r.getAs[Long]("n_docs") == grp.length)
      assert(r.getAs[Long]("kept") == grp.count(_._2 > 0))
      val mean = (grp.map(_._2).sum / grp.length).toDouble
      assert(approx(r.getAs[Double]("mean_score"), r6(mean).toDouble, 1e-6),
        s"$src mean: ${r.getAs[Double]("mean_score")} vs $mean")
    }
  }

  test("block bootstrap: full driver replay (md5 offsets, block sums, CI ranks)") {
    val r = SparkEntry.queries("ts_block_bootstrap")(spark, dir).head()
    // rebuild the return series
    val px = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket").agg(round(avg(col("value")), 6).as("px"))
      .orderBy("bucket").collect().map(_.getDouble(1))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val ret = px.sliding(2).map(p => r6(math.log(p(1) / p(0)))).toArray
    val n = ret.length
    assert(r.getAs[Long]("n_ret") == n)
    val L = 24
    val nOff = n - (L - 1)
    val k = (n + L - 1) / L
    val blockSum = (0 until nOff).map(o => ret.slice(o, o + L).sum)
    def md5off(b: Long, j: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$b:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % nOff).toInt // 1-based offset − 1
    }
    val means = (1 to 200).map { b =>
      val s = (1 to k).map(j => blockSum(md5off(b, j))).sum
      (b, BigDecimal((s / BigDecimal(k * L)).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP))
    }
    val sorted = means.sortBy { case (b, m) => (m, b) }.map(_._2)
    assert(approx(r.getAs[Double]("ci_lo"), r6(sorted(4).toDouble).toDouble, 1e-6))
    assert(approx(r.getAs[Double]("ci_hi"), r6(sorted(194).toDouble).toDouble, 1e-6))
    val mObs = (ret.sum / n).toDouble
    assert(approx(r.getAs[Double]("mean_ret"), r6(mObs).toDouble, 1e-6))
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
    assert(r.getAs[Double]("se_boot") >= 0.0)
  }

  test("k-core: h-index fixpoint equals exact driver peeling") {
    val rows = SparkEntry.queries("graph_k_core")(spark, dir).collect()
      .map(r => r.getAs[Long]("coreness") -> r.getAs[Long]("n_nodes")).toMap
    // driver peeling: exact core numbers by repeated min-degree removal
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCnt = new scala.collection.mutable.HashMap[(Long, Long), Int]()
    for (grp <- b.groupBy(_._1).values; x <- grp; y <- grp if x._2 < y._2)
      pairCnt((x._2, y._2)) = pairCnt.getOrElse((x._2, y._2), 0) + 1
    val adj = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.Set[Long]]()
    for (((u, v), c) <- pairCnt if c >= 2) {
      adj.getOrElseUpdate(u, scala.collection.mutable.Set()) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set()) += u
    }
    val deg = scala.collection.mutable.HashMap(adj.toSeq.map { case (k2, s) => k2 -> s.size }: _*)
    val core = scala.collection.mutable.HashMap[Long, Int]()
    val alive = scala.collection.mutable.Set(adj.keys.toSeq: _*)
    var kCur = 0
    while (alive.nonEmpty) {
      val mins = alive.filter(v => deg(v) <= kCur)
      if (mins.isEmpty) kCur += 1
      else for (v <- mins) {
        core(v) = kCur
        alive -= v
        for (u <- adj(v) if alive(u)) deg(u) -= 1
      }
    }
    val want = core.values.groupBy(identity).map { case (c, vs) => c.toLong -> vs.size.toLong }
    assert(rows == want, s"got $rows want $want")
  }

  test("rolling median: driver replay of the centered interpolated median") {
    val rows = SparkEntry.queries("ts_rolling_median")(spark, dir)
      .filter(col("event_type") === "view").orderBy("bucket").collect()
    val px = rows.map(_.getAs[Double]("px"))
    def medInterp(xs: Array[Double]): Double = {
      val s2 = xs.sorted
      val pos = 0.5 * (s2.length - 1)
      val (lo, hi) = (s2(pos.toInt), s2(math.ceil(pos).toInt))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    rows.zipWithIndex.foreach { case (r, i) =>
      val w = px.slice(math.max(0, i - 24), math.min(px.length, i + 25))
      assert(r.getAs[Long]("n_in_window") == w.length)
      assert(approx(r.getAs[Double]("roll_med"),
        math.rint(medInterp(w) * 1e6) / 1e6, 1e-6), s"row $i")
    }
  }

  test("error burst: episodes re-derived from raw error timestamps") {
    val rows = SparkEntry.queries("dq_error_burst")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    val byUser = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select("user_id", "ts_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val T = 3600000000000L
    for ((u, ts) <- byUser) {
      val qualifying = ts.filter(t => ts.count(x => x >= t - T && x <= t) >= 2)
      if (qualifying.isEmpty) assert(!rows.contains(u))
      else {
        val r = rows(u)
        assert(r.getAs[Long]("n_burst_rows") == qualifying.length)
        val eps = qualifying.foldLeft((0L, Option.empty[Long])) {
          case ((n, prev), t) =>
            (if (prev.forall(p => t - p > T)) n + 1 else n, Some(t))
        }._1
        assert(r.getAs[Long]("n_bursts") == eps, s"user $u")
        assert(r.getAs[Long]("first_burst_ns") == qualifying.head)
      }
    }
    assert(rows.keySet == byUser.keySet.filter(u =>
      byUser(u).exists(t => byUser(u).count(x => x >= t - T && x <= t) >= 2)))
  }

  test("croston: truncated-EWMA replay on the top part; forecast identity") {
    val rows = SparkEntry.queries("ml_croston")(spark, dir).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      assert(approx(r.getAs[Double]("croston_forecast"),
        math.rint(r.getAs[Double]("z_hat") / r.getAs[Double]("p_hat") * 1e6) / 1e6,
        1e-6))
      assert(r.getAs[Double]("p_hat") >= 1.0) // intervals are ≥ 1 day
    }
    // driver replay for the top part: same demand collapse, same
    // null-aware depth-40 truncated EMA
    val top = rows.map(_.getAs[Long]("part")).min // any; recompute its series
    val series = Tables.lineitem(spark, dir)
      .filter(col("l_partkey") === top)
      .groupBy(expr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')").as("day"))
      .agg(round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"), 6)
        .cast("double").as("q"))
      .orderBy("day").collect().map(r2 => (r2.getInt(0).toLong, r2.getDouble(1)))
    def ema(xs: Array[Option[Double]]): Double = {
      // value at the LAST point: weights 0.9^i over its depth-40 lags
      val last = xs.length - 1
      var num = 0.0; var den = 0.0
      for (i <- 0 until 40) {
        val idx = last - i
        val v = if (idx >= 0) xs(idx) else None
        v.foreach { x => num += math.pow(0.9, i) * x; den += math.pow(0.9, i) }
      }
      num / den
    }
    val sizes: Array[Option[Double]] = series.map(p => Option(p._2))
    val ivs = series.indices.map(i =>
      if (i == 0) None else Some((series(i)._1 - series(i - 1)._1).toDouble)).toArray
    val got = rows.find(_.getAs[Long]("part") == top).get
    assert(approx(got.getAs[Double]("z_hat"),
      math.rint(ema(sizes) * 1e6) / 1e6, 1e-5))
    assert(approx(got.getAs[Double]("p_hat"),
      math.rint(ema(ivs) * 1e6) / 1e6, 1e-5))
    assert(got.getAs[Long]("n_points") == series.length)
  }

  test("mahalanobis: driver replay of covariance, Cramer inverse, distances") {
    val rows = SparkEntry.queries("ml_anomaly_mahalanobis")(spark, dir).collect()
    assert(rows.length == 10)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // driver features (same rounding ladder)
    val feats = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value"), 6).cast("decimal(18,6)")).as("sv"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sk"))
      .collect().map { r2 =>
        val n = r2.getAs[Long]("n").toDouble
        (r2.getAs[Long]("user_id"),
          Array(r6(r2.getDecimal(2).doubleValue() / n), r6(math.log(n)),
            r6(r2.getAs[Long]("sk") / n)))
      }
    val n = feats.length.toDouble
    val mu = Array(0, 1, 2).map(j => feats.map(_._2(j)).sum / n)
    val c = Array.ofDim[Double](3, 3)
    for (i2 <- 0 until 3; j2 <- 0 until 3)
      c(i2)(j2) = feats.map(f => f._2(i2) * f._2(j2)).sum / n - mu(i2) * mu(j2)
    val det = c(0)(0) * (c(1)(1) * c(2)(2) - c(1)(2) * c(1)(2)) -
      c(0)(1) * (c(0)(1) * c(2)(2) - c(1)(2) * c(0)(2)) +
      c(0)(2) * (c(0)(1) * c(1)(2) - c(1)(1) * c(0)(2))
    val inv = Array(
      Array((c(1)(1) * c(2)(2) - c(1)(2) * c(1)(2)) / det,
        (c(0)(2) * c(1)(2) - c(0)(1) * c(2)(2)) / det,
        (c(0)(1) * c(1)(2) - c(0)(2) * c(1)(1)) / det),
      Array(0.0, (c(0)(0) * c(2)(2) - c(0)(2) * c(0)(2)) / det,
        (c(0)(2) * c(0)(1) - c(0)(0) * c(1)(2)) / det),
      Array(0.0, 0.0, (c(0)(0) * c(1)(1) - c(0)(1) * c(0)(1)) / det))
    inv(1)(0) = inv(0)(1); inv(2)(0) = inv(0)(2); inv(2)(1) = inv(1)(2)
    def d2(f: Array[Double]): Double = {
      val d = Array(f(0) - mu(0), f(1) - mu(1), f(2) - mu(2))
      (for (i2 <- 0 until 3; j2 <- 0 until 3) yield d(i2) * d(j2) * inv(i2)(j2)).sum
    }
    // identity: mean Mahalanobis² under the population covariance = p = 3
    val all = feats.map(f => d2(f._2))
    assert(math.abs(all.sum / n - 3.0) < 1e-6, s"mean d² = ${all.sum / n}")
    // engine top-10 matches the driver ranking and values
    val want = feats.map(f => (f._1, d2(f._2)))
      .sortBy { case (u, dd) => (-r6(dd), u) }.take(10)
    rows.zip(want).foreach { case (r2, (u, dd)) =>
      assert(r2.getAs[Long]("user_id") == u)
      assert(approx(r2.getAs[Double]("mahal_sq"), r6(dd), 1e-4),
        s"user $u: ${r2.getAs[Double]("mahal_sq")} vs $dd")
    }
  }

  test("time-to-convert: driver replay of the conversion latency audit") {
    val r = SparkEntry.queries("agg_time_to_convert")(spark, dir).head()
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_type", "ts_ns").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val signups = ev.filter(_._2 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val purchases = ev.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._3)).toMap
    val lat = signups.map { case (u, s) =>
      purchases.getOrElse(u, Array.empty[Long]).filter(_ >= s) match {
        case e if e.isEmpty => None
        case e => Some(math.rint((e.min - s) / 3.6e12 * 1e6) / 1e6)
      }
    }
    assert(r.getAs[Long]("n_users") == signups.size)
    assert(r.getAs[Long]("n_converted") == lat.count(_.isDefined))
    val hs = lat.flatten.toArray.sorted
    def q(p: Double): Double = {
      val pos = p * (hs.length - 1)
      hs(pos.toInt) + (pos - pos.toInt) *
        (hs(math.ceil(pos).toInt) - hs(pos.toInt))
    }
    assert(approx(r.getAs[Double]("p50_hours"), math.rint(q(0.5) * 1e6) / 1e6, 1e-6))
    assert(approx(r.getAs[Double]("p90_hours"), math.rint(q(0.9) * 1e6) / 1e6, 1e-6))
  }

  test("kupiec backtest: LR re-derived from emitted counts, coverage sane") {
    val rows = SparkEntry.queries("fin_var_backtest_kupiec")(spark, dir).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val (n, x) = (r.getAs[Long]("n_ret"), r.getAs[Long]("n_exceed"))
      // exact ceil-rank VaR ⇒ at least ceil(0.05n) returns sit at/below it
      assert(x >= math.ceil(0.05 * n).toLong && x <= n / 2)
      val xr = x.toDouble / n
      val lr = -2.0 * ((n - x) * math.log(0.95) + x * math.log(0.05) -
        (n - x) * math.log(1.0 - xr) -
        (if (x == 0) 0.0 else x * math.log(xr)))
      assert(approx(r.getAs[Double]("lr_pof"), math.rint(lr * 1e6) / 1e6, 1e-6))
      assert(r.getAs[Boolean]("reject_95") == (r.getAs[Double]("lr_pof") > 3.841459))
      assert(r.getAs[Double]("lr_pof") >= -1e-9)
    }
  }

  test("mase: ratio identity and one-series driver replay") {
    val rows = SparkEntry.queries("ml_metric_mase")(spark, dir).collect()
    assert(rows.length == 5)
    for (r <- rows)
      assert(approx(r.getAs[Double]("mase"),
        math.rint(r.getAs[Double]("mae_seasonal") / r.getAs[Double]("mae_naive") * 1e6) / 1e6,
        2e-6))
    val px = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket").agg(round(avg(col("value")), 6).as("px"))
      .orderBy("bucket").collect().map(_.getDouble(1))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pairs = (48 until px.length).map(i =>
      (r6(math.abs(px(i) - px(i - 48))), r6(math.abs(px(i) - px(i - 1)))))
    val r = rows.find(_.getAs[String]("event_type") == "click").get
    assert(r.getAs[Long]("n") == pairs.length)
    assert(approx(r.getAs[Double]("mae_seasonal"),
      r6((pairs.map(_._1).sum / pairs.length).toDouble).toDouble, 1e-6))
    assert(approx(r.getAs[Double]("mae_naive"),
      r6((pairs.map(_._2).sum / pairs.length).toDouble).toDouble, 1e-6))
  }

  test("assortativity: driver replay over the rebuilt edge list, bounds") {
    val r = SparkEntry.queries("graph_assortativity")(spark, dir).head()
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val pairCnt = new scala.collection.mutable.HashMap[(Long, Long), Int]()
    for (grp <- b.groupBy(_._1).values; x <- grp; y <- grp if x._2 < y._2)
      pairCnt((x._2, y._2)) = pairCnt.getOrElse((x._2, y._2), 0) + 1
    val edges = pairCnt.filter(_._2 >= 2).keys.toSeq
    val dirEdges = edges ++ edges.map(e => (e._2, e._1))
    val deg = dirEdges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m = dirEdges.length.toDouble
    val (du, dv) = (dirEdges.map(e => deg(e._1).toDouble),
      dirEdges.map(e => deg(e._2).toDouble))
    val (su, sv) = (du.sum, dv.sum)
    val suv = dirEdges.map(e => deg(e._1).toDouble * deg(e._2)).sum
    val (suu, svv) = (du.map(x => x * x).sum, dv.map(x => x * x).sum)
    val want = (suv / m - (su / m) * (sv / m)) /
      (math.sqrt(suu / m - (su / m) * (su / m)) *
        math.sqrt(svv / m - (sv / m) * (sv / m)))
    assert(approx(a, math.rint(want * 1e6) / 1e6, 1e-5), s"$a vs $want")
    assert(r.getAs[Long]("n_edges") == edges.length)
  }

  test("spectral entropy: bounds, white-noise law, one-series driver replay") {
    val rows = SparkEntry.queries("ts_spectral_entropy")(spark, dir).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val h = r.getAs[Double]("spectral_entropy")
      assert(h >= 0.0 && h <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_periods") == 95)
      val p = r.getAs[Int]("peak_period")
      assert(p >= 2 && p <= 96)
    }
    // driver replay for one series (same rounding ladder)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val px = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("bucket", expr("ts_ns div 1800000000000L"))
      .groupBy("bucket").agg(round(avg(col("value")), 6).as("px"))
      .orderBy("bucket").collect().map(_.getDouble(1))
    val mu = r6((px.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum /
      px.length).toDouble).toDouble
    val c = px.map(x => r6(x - mu))
    val pows = (2 to 96).map { p =>
      var a = BigDecimal(0); var b = BigDecimal(0)
      for (t <- px.indices) {
        val ang = 6.283185307179586 * t / p
        a += c(t) * r6(math.cos(ang))
        b += c(t) * r6(math.sin(ang))
      }
      r6(a.toDouble * a.toDouble + b.toDouble * b.toDouble)
    }
    val tp = pows.sum.toDouble
    val hsum = pows.map { pw =>
      val q = pw.toDouble / tp
      BigDecimal(if (q <= 0) 0.0 else -q * math.log(q))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val want = r6(hsum / math.log(95.0)).toDouble
    val got = rows.find(_.getAs[String]("event_type") == "purchase").get
    assert(approx(got.getAs[Double]("spectral_entropy"), want, 1e-5),
      s"${got.getAs[Double]("spectral_entropy")} vs $want")
  }

  test("hierarchical reconcile: four methods, coherent test support") {
    val rows = SparkEntry.queries("ml_hierarchical_reconcile")(spark, dir)
      .collect().map(r => (r.getAs[String]("level"), r.getAs[String]("method")) ->
        r.getAs[Double]("mae")).toMap
    assert(rows.keySet == Set(("total", "bottom_up"), ("total", "direct"),
      ("series", "naive"), ("series", "top_down")))
    assert(rows.values.forall(_ >= 0.0))
    // driver replay of the total-level rows: rebuild complete 6-hour
    // buckets, total series, and the lag-4 (daily cycle) test split
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val perType = Tables.events(spark, dir)
      .withColumn("bucket", expr("ts_ns div 21600000000000L"))
      .groupBy("event_type", "bucket")
      .agg(round(avg(col("value")), 6).as("px"))
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[String]("event_type"),
        BigDecimal(r.getAs[Double]("px")).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
    val byBucket = perType.groupBy(_._1).filter(_._2.length == 5)
    val totals = byBucket.view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1).map(_._2)
    val n = totals.length
    assert(n > 16, s"need > 16 complete buckets, got $n")
    val test = (n - 12) until n
    val maeDirect = r6(test.map(i => (totals(i) - totals(i - 4)).abs)
      .map(e => r6(e)).sum / 12).toDouble
    assert(approx(rows(("total", "direct")), maeDirect, 1e-6),
      s"${rows(("total", "direct"))} vs $maeDirect")
    // bottom-up total forecast = Σ per-series lag-48 = total at lag-48 on
    // COMPLETE buckets ⇒ BU ≡ direct at the total level for this
    // hierarchy (the coherence identity — a structural check)
    assert(rows(("total", "bottom_up")) == rows(("total", "direct")))
  }

  test("theta forecast: driver replay of trend, theta-2 SES, and the average") {
    val rows = SparkEntry.queries("ml_theta_forecast")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows.size == 5)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (tpe <- Seq("purchase", "view")) {
      val xs = Tables.events(spark, dir)
        .filter(col("event_type") === tpe)
        .withColumn("bucket", expr("ts_ns div 1800000000000L"))
        .groupBy("bucket").agg(round(avg(col("value")), 6).as("px"))
        .orderBy("bucket").collect().map(_.getDouble(1))
      val n = xs.length.toDouble
      val ts2 = xs.indices.map(_.toDouble)
      val (sx, sxt, st, st2) =
        (xs.sum, xs.zip(ts2).map(p => p._1 * p._2).sum, ts2.sum, ts2.map(t => t * t).sum)
      val slope = (n * sxt - st * sx) / (n * st2 - st * st)
      val intercept = (sx - slope * st) / n
      val z2 = xs.indices.map(i => r6(2.0 * xs(i) - (intercept + slope * i)))
      var num = 0.0; var den = 0.0
      for (i <- 0 until 40; idx = z2.length - 1 - i if idx >= 0) {
        num += math.pow(0.7, i) * z2(idx); den += math.pow(0.7, i)
      }
      val ses = num / den
      val want = r6(0.5 * (intercept + slope * n) + 0.5 * ses)
      val r = rows(tpe)
      assert(approx(r.getAs[Double]("slope"), r6(slope), 1e-5))
      assert(approx(r.getAs[Double]("ses_theta2"), r6(ses), 1e-4),
        s"$tpe ses: ${r.getAs[Double]("ses_theta2")} vs $ses")
      assert(approx(r.getAs[Double]("forecast_next"), want, 1e-4),
        s"$tpe: ${r.getAs[Double]("forecast_next")} vs $want")
      assert(r.getAs[Long]("n_obs") == xs.length)
    }
  }

  test("common neighbors: top pair re-derived, no candidate is an edge") {
    val rows = SparkEntry.queries("graph_common_neighbors")(spark, dir).collect()
    assert(rows.nonEmpty)
    // driver rebuild of adjacency
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCnt = new scala.collection.mutable.HashMap[(Long, Long), Int]()
    for (grp <- b.groupBy(_._1).values; x <- grp; y <- grp if x._2 < y._2)
      pairCnt((x._2, y._2)) = pairCnt.getOrElse((x._2, y._2), 0) + 1
    val edges = pairCnt.filter(_._2 >= 2).keys.toSet
    val adj = new scala.collection.mutable.HashMap[Long, Set[Long]]().withDefaultValue(Set())
    for ((u, v) <- edges) { adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    for (r <- rows) {
      val (u, v) = (r.getAs[Long]("u"), r.getAs[Long]("v"))
      assert(!edges.contains((u, v)) && !edges.contains((v, u)))
      val cn = (adj(u) intersect adj(v)).size
      assert(r.getAs[Long]("common") == cn, s"($u,$v): ${r.getAs[Long]("common")} vs $cn")
      assert(r.getAs[Long]("deg_u") == adj(u).size)
      val jac = cn.toDouble / (adj(u).size + adj(v).size - cn)
      assert(approx(r.getAs[Double]("jaccard"), math.rint(jac * 1e6) / 1e6, 1e-6))
    }
  }

  test("freshness SLA: integer lags vs the recomputed watermark, flags exact") {
    val out = SparkEntry.queries("dq_freshness_sla")(spark, dir).collect()
    assert(out.nonEmpty)
    val wm = out.map(_.getAs[Long]("last_ts_ns")).max
    assert(out.count(_.getAs[Long]("lag_minutes") == 0L) >= 1)
    out.foreach { r =>
      val lag = wm - r.getAs[Long]("last_ts_ns")
      assert(r.getAs[Long]("lag_minutes") == lag / 60000000000L)
      assert(r.getAs[Int]("fresh_30m") ==
        (if (lag <= 1800000000000L) 1 else 0))
    }
  }

  test("volume anomaly: exact median/MAD replay, integer flag rule, discriminates") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("dq_volume_anomaly")(spark, dir)
      .collect().sortBy(_.getAs[Long]("day"))
    // replay from the raw per-day counts
    val counts = Tables.events(spark, dir)
      .select(expr("ts_ns div 86400000000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == counts.size)
    def med2Of(vs: Seq[Long]): Long = {
      val s = vs.sorted; val nn = s.length
      s((nn + 1) / 2 - 1) + s((nn + 2) / 2 - 1)
    }
    val med2 = med2Of(counts.values.toSeq)
    val mad4 = med2Of(counts.values.map(n => math.abs(2 * n - med2)).toSeq)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      assert(n == counts(r.getAs[Long]("day")))
      assert(r.getAs[Double]("median_volume") == med2.toDouble / 2)
      assert(r.getAs[Double]("mad_volume") == mad4.toDouble / 4)
      assert(r.getAs[Boolean]("anomaly") ==
        (2 * math.abs(2 * n - med2) > 3 * mad4), s"day ${r.getAs[Long]("day")}")
    }
    // the band must DISCRIMINATE on harness data
    assert(rows.exists(_.getAs[Boolean]("anomaly")),
      "a band no day ever leaves audits nothing")
    assert(rows.exists(!_.getAs[Boolean]("anomaly")))
  }
}
