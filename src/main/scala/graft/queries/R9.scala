package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 wave registry: sequence mining, sketch-sampled quantiles,
  * permutation inference with FDR control, mRMR feature selection, and
  * minimum-variance portfolio optimization.
  *
  * House conventions throughout: 1e-6-grid inputs, DECIMAL accumulation
  * for any sum that feeds a division or crosses an aggregation whose
  * order the engines don't share, `round(x, n) + 0.0` on sign-indefinite
  * outputs (the r8 signed-zero lesson), md5 as the cross-engine
  * deterministic hash, unpartitioned windows only over bounded frames.
  */
object R9 {

  type Q = (SparkSession, String) => DataFrame

  /** The per-invocation temp-view front door (the `Rel.sqlFrontDoor`
    * discipline) for the shared-template queries in this file. */
  private val sqlRuns = new java.util.concurrent.atomic.AtomicLong(0)
  private def withEventsView[T](s: SparkSession, d: String)(f: String => T): T = {
    val v = s"events_r9_v${sqlRuns.incrementAndGet()}"
    try {
      Tables.events(s, d).createOrReplaceTempView(v)
      f(v)
    } finally { s.catalog.dropTempView(v); () }
  }

  // ---- shared templates ---------------------------------------------------

  /** Dialect knobs for the shared templates: everything else is ONE text
    * both engines parse, so the sides cannot drift. */
  private case class Dialect(
    bucket: String,       // 30-min bucket ordinal from the event time
    day: String,          // epoch-day ordinal
    kJson: String,        // BIGINT k from the props JSON payload
    median: String,       // exact interpolated median of `value`
    reps: String => String) // 0..B-1 integer generator as `SELECT ... AS r`

  private def sparkDialect = Dialect(
    bucket = "ts_ns div 1800000000000",
    day = "ts_ns div 86400000000000",
    kJson = "CAST(get_json_object(props, '$.k') AS BIGINT)",
    median = "percentile(value, 0.5)",
    reps = b => s"SELECT explode(sequence(0, ${b})) AS r")

  private def duckDialect = Dialect(
    bucket = "epoch_ns(ts) // 1800000000000",
    day = "epoch_ns(ts) // 86400000000000",
    kJson = "CAST(json_extract(props, '$.k') AS BIGINT)",
    median = "quantile_cont(value, 0.5)",
    reps = b => s"SELECT unnest(generate_series(0, ${b})) AS r")

  /** RANDOMIZATION TEST + BENJAMINI–HOCHBERG FDR — multiple-testing
    * inference done the way a 100 TB engine has to do it: the "random"
    * relabeling is the house md5 hash (deterministic, mergeable,
    * replayable by any engine — no RNG state), so each of the B=100
    * replicates is one CASE expression, the whole family of 10 pairwise
    * mean-difference tests is TWO aggregations over an exploded
    * (pair × replicate) frame, and the step-up BH rule is a 10-row
    * window. Hash relabeling (each pooled bar flips sides with p=1/2) is
    * the binomial approximation of the exact permutation — standard for
    * n in the thousands, and the only form whose replicates need no
    * global shuffle of labels. p = (1 + #extreme)/(B + 1), decided on
    * the 1e-6 grid. */
  private def permutationFdrSql(events: String, dl: Dialect): String =
    s"""WITH b AS (
       |  SELECT event_type AS g, ${dl.bucket} AS bucket,
       |    CAST(round(avg(value), 6) AS DECIMAL(18,6)) AS px
       |  FROM $events GROUP BY 1, 2),
       |types AS (SELECT DISTINCT g FROM b),
       |pairs AS (SELECT a.g AS ga, c.g AS gb FROM types a
       |  JOIN types c ON a.g < c.g),
       |pool AS (
       |  SELECT p.ga, p.gb, b.g, b.bucket, b.px FROM pairs p
       |    JOIN b ON b.g = p.ga
       |  UNION ALL
       |  SELECT p.ga, p.gb, b.g, b.bucket, b.px FROM pairs p
       |    JOIN b ON b.g = p.gb),
       |obs AS (
       |  SELECT ga, gb,
       |    CAST(sum(CASE WHEN g = ga THEN px END) AS DOUBLE)
       |      / count(CASE WHEN g = ga THEN 1 END)
       |    - CAST(sum(CASE WHEN g = gb THEN px END) AS DOUBLE)
       |      / count(CASE WHEN g = gb THEN 1 END) AS t_obs
       |  FROM pool GROUP BY 1, 2),
       |reps AS (${dl.reps("99")}),
       |rep AS (
       |  SELECT ga, gb, r,
       |    CAST(sum(CASE WHEN side = 0 THEN px END) AS DOUBLE)
       |      / count(CASE WHEN side = 0 THEN 1 END)
       |    - CAST(sum(CASE WHEN side = 1 THEN px END) AS DOUBLE)
       |      / count(CASE WHEN side = 1 THEN 1 END) AS t_r
       |  FROM (
       |    SELECT pool.ga, pool.gb, reps.r, pool.px,
       |      (CAST(conv(substring(md5(concat(CAST(reps.r AS STRING), ':',
       |        pool.g, ':', CAST(pool.bucket AS STRING))), 1, 8), 16, 10)
       |        AS BIGINT) % 2) AS side
       |    FROM pool CROSS JOIN reps) t
       |  GROUP BY 1, 2, 3),
       |pv AS (
       |  SELECT obs.ga, obs.gb, round(obs.t_obs, 6) + 0.0 AS t_obs,
       |    round(CAST(1 + sum(CASE WHEN round(abs(t_r), 6) >=
       |        round(abs(t_obs), 6) THEN 1 ELSE 0 END) AS DOUBLE) / 101, 6)
       |      AS p_value
       |  FROM rep JOIN obs ON rep.ga = obs.ga AND rep.gb = obs.gb
       |  GROUP BY 1, 2, 3),
       |ranked AS (
       |  SELECT ga, gb, t_obs, p_value,
       |    row_number() OVER (ORDER BY p_value, ga, gb) AS p_rank,
       |    count(*) OVER () AS m
       |  FROM pv),
       |kmax AS (
       |  SELECT coalesce(max(CASE WHEN p_value * m <= p_rank * 0.1
       |    THEN p_rank END), 0) AS km FROM ranked)
       |SELECT ga AS series_a, gb AS series_b, t_obs, p_value,
       |  p_rank, round(p_rank * 0.1 / m, 6) AS bh_threshold,
       |  p_rank <= kmax.km AS reject_fdr10
       |FROM ranked CROSS JOIN kmax
       |ORDER BY p_rank""".stripMargin

  /** The Spark-dialect md5 relabeling above uses `conv`/`substring`,
    * which DuckDB spells differently — so the permutation template is
    * split at ONLY that expression. */
  private def permutationFdrSqlDuck(events: String, dl: Dialect): String =
    permutationFdrSql(events, dl).replace(
      """(CAST(conv(substring(md5(concat(CAST(reps.r AS STRING), ':',
        |        pool.g, ':', CAST(pool.bucket AS STRING))), 1, 8), 16, 10)
        |        AS BIGINT) % 2) AS side""".stripMargin,
      """(('0x' || substr(md5(reps.r::VARCHAR || ':' || pool.g || ':' ||
        |        pool.bucket::VARCHAR), 1, 8))::BIGINT % 2) AS side""".stripMargin)

  /** mRMR FEATURE SELECTION (Peng et al. 2005 — max-relevance
    * min-redundancy, MID form): the feature-selection pass a modeling
    * pipeline runs before any `ml_*` fit. Five discrete candidate
    * features over the event fact (hour-of-day band, payload-k band,
    * value-vs-median, user bucket, day-of-week) against the purchase
    * target. ONE scan collapses the fact to the joint contingency CUBE
    * (≤ a few thousand cells); every relevance MI(f; y) and redundancy
    * MI(f; f') then re-aggregates the cube — never the fact. The greedy
    * selection unrolls as five chained CTE steps (argmax is a window
    * rank with a name tiebreak), so the full selection ORDER ships in
    * the result and the DuckDB twin replays it exactly. MI terms are
    * re-gridded at 1e-9 and summed in DECIMAL (cell order differs per
    * engine); counts are exact integers so both engines ln() identical
    * rationals. */
  private val mrmrFeats = Seq("f_hour", "f_k", "f_val", "f_user", "f_dow")

  /** The SHARED MI section of the mRMR query, downstream of the joint
    * contingency cube: the relevance vector MI(f; y) and symmetric
    * redundancy matrix MI(f; f') from cube re-aggregation. One text for
    * both engines (`cube` is a table reference — a checkpointed temp
    * view on the Spark side, a MATERIALIZED CTE on the DuckDB side,
    * because BOTH engines re-evaluate a plain CTE per reference and
    * this section references the cube ~16 times). Returns the text
    * AFTER the `WITH` keyword. */
  private def mrmrMiSql(cube: String): String = {
    val feats = mrmrFeats
    val fy = feats.map(f =>
      s"SELECT '$f' AS f, $f AS lv, y, sum(c) AS c FROM $cube GROUP BY 2, 3")
      .mkString("\n  UNION ALL\n  ")
    val prs = (for {
      i <- feats.indices; j <- feats.indices if i < j
    } yield s"SELECT '${feats(i)}' AS fa, '${feats(j)}' AS fb, " +
        s"${feats(i)} AS la, ${feats(j)} AS lb, sum(c) AS c " +
        s"FROM $cube GROUP BY 3, 4")
      .mkString("\n  UNION ALL\n  ")
    s"""nt AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM $cube),
       |fy AS (
       |  $fy),
       |rel AS (
       |  SELECT f,
       |    CAST(sum(CAST(round((c / nt.n) * ln(c * nt.n / (cx * cy)), 9)
       |      AS DECIMAL(28,9))) AS DOUBLE) AS mi
       |  FROM (
       |    SELECT f, lv, y, c,
       |      sum(c) OVER (PARTITION BY f, lv) AS cx,
       |      sum(c) OVER (PARTITION BY f, y) AS cy
       |    FROM fy) t CROSS JOIN nt
       |  GROUP BY f),
       |pr AS (
       |  $prs),
       |red0 AS (
       |  SELECT fa, fb,
       |    CAST(sum(CAST(round((c / nt.n) * ln(c * nt.n / (ca * cb)), 9)
       |      AS DECIMAL(28,9))) AS DOUBLE) AS mi
       |  FROM (
       |    SELECT fa, fb, la, lb, c,
       |      sum(c) OVER (PARTITION BY fa, fb, la) AS ca,
       |      sum(c) OVER (PARTITION BY fa, fb, lb) AS cb
       |    FROM pr) t CROSS JOIN nt
       |  GROUP BY fa, fb),
       |red AS (SELECT fa, fb, mi FROM red0
       |  UNION ALL SELECT fb AS fa, fa AS fb, mi FROM red0)""".stripMargin
  }

  /** The greedy-selection tail of the oracle (unrolled CTE steps over
    * the MI section — the DuckDB side only; Spark replays this exact
    * arithmetic on the driver because Catalyst's re-planning of the
    * chain's ~2⁵ inlined CTE references is a many-minutes analysis
    * blow-up even over a tiny materialized cube). */
  private def mrmrStepsSql: String = {
    val feats = mrmrFeats
    val steps = (2 to feats.length).map { k =>
      s"""s$k AS (
         |  SELECT $k AS step, f, relevance, redundancy, score FROM (
         |    SELECT r.f, r.mi AS relevance, rd.ar AS redundancy,
         |      round(r.mi - rd.ar, 9) AS score,
         |      row_number() OVER (ORDER BY round(r.mi - rd.ar, 9) DESC, r.f)
         |        AS rn
         |    FROM rel r JOIN (
         |      SELECT red.fa AS f,
         |        CAST(sum(CAST(round(red.mi, 9) AS DECIMAL(28,9)))
         |          AS DOUBLE) / ${k - 1}.0 AS ar
         |      FROM red JOIN sel${k - 1} sp ON red.fb = sp.f
         |      GROUP BY red.fa) rd ON rd.f = r.f
         |    WHERE r.f NOT IN (SELECT f FROM sel${k - 1})) t
         |  WHERE rn = 1),
         |sel$k AS (SELECT f FROM sel${k - 1} UNION ALL SELECT f FROM s$k)"""
        .stripMargin
    }.mkString(",\n")
    val unionAll = (1 to feats.length).map(k => s"SELECT * FROM s$k")
      .mkString(" UNION ALL ")
    s"""s1 AS (
       |  SELECT 1 AS step, f, mi AS relevance, CAST(0.0 AS DOUBLE)
       |    AS redundancy, mi AS score
       |  FROM (SELECT f, mi, row_number() OVER (ORDER BY mi DESC, f) AS rn
       |        FROM rel) t WHERE rn = 1),
       |sel1 AS (SELECT f FROM s1),
       |$steps
       |SELECT step, f AS feature,
       |  round(relevance, 6) + 0.0 AS relevance,
       |  round(redundancy, 6) + 0.0 AS redundancy,
       |  round(score, 6) + 0.0 AS score
       |FROM ($unionAll) allsteps
       |ORDER BY step""".stripMargin
  }

  /** DuckDB rendition: cube built inline from the events table as
    * MATERIALIZED CTEs (without the hint DuckDB re-evaluates the whole
    * fw scan per cube reference — measured 99 s → 5 s at sf0.01). */
  private def mrmrSqlDuck(events: String, dl: Dialect): String =
    s"""WITH med AS MATERIALIZED (SELECT ${dl.median} AS m FROM $events),
       |fw AS MATERIALIZED (
       |  SELECT
       |    CAST(floor(hour(ts) / 6.0) AS BIGINT) AS f_hour,
       |    CAST(floor(${dl.kJson} / 25.0) AS BIGINT) AS f_k,
       |    CASE WHEN value >= med.m THEN 1 ELSE 0 END AS f_val,
       |    user_id % 3 AS f_user,
       |    (${dl.day}) % 7 AS f_dow,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
       |  FROM $events CROSS JOIN med),
       |mrmr_cube AS MATERIALIZED (
       |  SELECT f_hour, f_k, f_val, f_user, f_dow, y, count(*) AS c
       |  FROM fw GROUP BY 1, 2, 3, 4, 5, 6),
       |${mrmrMiSql("mrmr_cube")},
       |$mrmrStepsSql""".stripMargin

  // ---- queries ------------------------------------------------------------

  val qs: Map[String, Q] = Map(

    /** SEQUENTIAL PATTERN MINING, length-3 — the path generalization of
      * `seq_markov_transitions` (pairs) and `funnel` (one fixed path):
      * every per-user consecutive event-type trigram on the
      * (t, event_id) total order, counted and ranked. ONE per-user
      * window pass (two leads share the frame) + one ≤k³-sized
      * aggregation; the share rides a window over that bounded frame.
      * The "what do users actually do" query behind any funnel design. */
    "seq_path_trigrams" -> ((s, d) => {
      val uw = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("t"))
        .withColumn("e2", lead(col("event_type"), 1).over(uw))
        .withColumn("e3", lead(col("event_type"), 2).over(uw))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("s1"), col("e2").as("s2"),
          col("e3").as("s3"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share", round(col("n") / sum(col("n")).over(all), 6))
        .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
        .limit(20)
    }),

    /** BOTTOM-K QUANTILE SKETCH AUDIT — the mergeable quantile path
      * (KMV/bottom-k sampling: keep the k rows with the smallest
      * md5(event_id); the bottom-k of a union is the bottom-k of the
      * merged bottom-k's, so the sample is mergeable across partitions
      * and DETERMINISTIC, unlike a t-digest whose merge order leaks into
      * the result). Per series: interpolated quantiles over the 256-row
      * sample NEXT TO the exact quantiles over the full data, absolute
      * error in the result — the audit a serving layer runs before
      * trusting the sketch. Sample membership is a rank over the house
      * hash; both engines pick identical rows and interpolate identical
      * grid values. */
    "agg_quantile_bottomk" -> ((s, d) => {
      val hv = expr("conv(substring(md5(cast(event_id AS string)), 1, 8), 16, 10)")
        .cast("long")
      val rw = Window.partitionBy("event_type").orderBy(col("hv"), col("event_id"))
      val base = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          round(col("value"), 6).as("v"))
        .withColumn("hv", hv)
        .withColumn("rk", row_number().over(rw))
      val qsArr = "array(0.1, 0.25, 0.5, 0.75, 0.9)"
      val est = base.filter(col("rk") <= 256)
        .groupBy("event_type")
        .agg(expr(s"percentile(v, $qsArr)").as("est"),
          count(lit(1)).as("n_sample"))
      val exact = base.groupBy("event_type")
        .agg(expr(s"percentile(v, $qsArr)").as("ex"),
          count(lit(1)).as("n_total"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("n_total"), col("n_sample"),
          posexplode(arrays_zip(col("est"), col("ex"))))
        .select(col("event_type"), col("n_total"), col("n_sample"),
          element_at(lit(Array(0.1, 0.25, 0.5, 0.75, 0.9)), col("pos") + 1)
            .as("q"),
          (round(col("col.est"), 6) + 0.0).as("est_q"),
          (round(col("col.ex"), 6) + 0.0).as("exact_q"),
          round(abs(col("col.est") - col("col.ex")), 6).as("abs_err"))
        .orderBy("event_type", "q")
    }),

    "stat_permutation_fdr" -> ((s, d) =>
      withEventsView(s, d)(v => s.sql(permutationFdrSql(v, sparkDialect)))),

    /** Spark side of mRMR: the fact collapses to the joint contingency
      * cube ONCE (one scan — json parse, bucketing, the exact global
      * median as a driver scalar), the cube is localCheckpoint'd and
      * registered as a temp view, and the SHARED MI core (identical
      * text to the DuckDB twin's rel/red section) computes the
      * relevance vector and redundancy matrix through the `spark.sql`
      * front door. The greedy selection itself runs on the DRIVER over
      * the collected 5+20-value MI matrix (aggregate-sized — the
      * `ml_pacf` bound) with BigDecimal arithmetic replicating the
      * oracle's unrolled CTE chain exactly: Catalyst re-plans the
      * 5-step chain's ~2⁵ inlined CTE references into a
      * many-minutes analysis blow-up even over the tiny cube view, and
      * a 25-value greedy loop is driver work by any honest reading. */
    "feature_select_mrmr" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val med = ev.agg(expr("percentile(value, 0.5)")).head().getDouble(0)
      val cube = ev.select(
          expr("CAST(floor(hour(ts) / 6.0) AS BIGINT)").as("f_hour"),
          expr("CAST(floor(CAST(get_json_object(props, '$.k') AS BIGINT) / 25.0) AS BIGINT)")
            .as("f_k"),
          when(col("value") >= med, 1).otherwise(0).as("f_val"),
          (col("user_id") % 3).as("f_user"),
          expr("(ts_ns div 86400000000000) % 7").as("f_dow"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("y"))
        .groupBy("f_hour", "f_k", "f_val", "f_user", "f_dow", "y")
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val v = s"mrmr_cube_v${sqlRuns.incrementAndGet()}"
      val (rel, red) = try {
        cube.createOrReplaceTempView(v)
        val rel = s.sql("WITH " + mrmrMiSql(v) + " SELECT f, mi FROM rel")
          .as[(String, Double)].collect().toMap
        val red = s.sql("WITH " + mrmrMiSql(v) + " SELECT fa, fb, mi FROM red")
          .as[(String, String, Double)].collect()
          .map { case (a, b, m) => (a, b) -> m }.toMap
        (rel, red)
      } finally { s.catalog.dropTempView(v); () }
      // driver greedy — the exact arithmetic of the oracle's CTE chain:
      // ar = exact-DECIMAL sum of round(mi, 9) over selected, / (k-1);
      // score = round(mi - ar, 9); argmax with the feature-name tiebreak
      def r9d(x: Double, sc: Int = 9): Double =
        BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
      val selected = scala.collection.mutable.ArrayBuffer.empty[
        (Int, String, Double, Double, Double)]
      val remaining = scala.collection.mutable.SortedSet(mrmrFeats: _*)
      for (step <- 1 to mrmrFeats.length) {
        val scored = remaining.toSeq.map { f =>
          val ar =
            if (step == 1) 0.0
            else selected.map(sp => BigDecimal(r9d(red((f, sp._2)))))
              .sum.toDouble / (step - 1).toDouble
          val score = if (step == 1) rel(f) else r9d(rel(f) - ar)
          (f, rel(f), ar, score)
        }
        val best = scored.sortBy { case (f, _, _, sc) => (-sc, f) }.head
        selected += ((step, best._1, best._2, best._3, best._4))
        remaining -= best._1
      }
      def r6(x: Double): Double = r9d(x, 6) + 0.0
      selected.toSeq.map { case (st, f, relv, ar, sc) =>
        (st, f, r6(relv), r6(ar), r6(sc)) }
        .toDF("step", "feature", "relevance", "redundancy", "score")
    }),

    /** MINIMUM-VARIANCE PORTFOLIO (Markowitz 1952, the GMV corner of the
      * frontier) over the five event-type "instruments": 30-min
      * log-return series pivoted wide on COMPLETE buckets (cardinality
      * computed, never assumed — the r8 reconcile lesson), the k×k
      * covariance from ONE DECIMAL-exact moment aggregation
      * (aggregate-sized driver state), then w = Σ⁻¹1 / (1ᵀΣ⁻¹1) via
      * driver Gaussian elimination with partial pivoting — k² numbers,
      * the `ml_influence_diagnostics` posture. Output carries the
      * portfolio variance next to the equal-weight variance so the
      * optimality claim is IN the result. Rows-only (a matrix inverse
      * has no SQL form at k>3); R9Spec pins Σw=1, the KKT
      * proportionality Σw ∝ 1, and GMV-dominance over equal weight. */
    "fin_min_variance_portfolio" -> ((s, d) => {
      import s.implicits._
      val wOrd = Window.partitionBy("event_type").orderBy("bucket")
      // 6-hour bars — the `ml_hierarchical_reconcile` grain lesson:
      // complete all-series buckets must exist at EVERY SF, and 30-min
      // bars leave the sf0.001 pivot empty after the completeness drop
      val bars = Tables.events(s, d)
        .withColumn("bucket", expr("ts_ns div 21600000000000L"))
        .groupBy("event_type", "bucket")
        .agg(round(avg(col("value")), 6).as("px"))
        .withColumn("r", round(log(col("px") / lag(col("px"), 1).over(wOrd)), 6))
        .filter(col("r").isNotNull)
      val types = bars.select("event_type").distinct()
        .as[String].collect().sorted
      val k = types.length
      val wide = bars.groupBy("bucket").pivot("event_type", types)
        .agg(first(col("r")))
        .na.drop("any")
        .cache()
      try {
        def dec(c: Column) = c.cast("decimal(18,6)")
        val aggs =
          types.map(t => sum(dec(col(t))).as(s"s_$t")) ++
          (for (i <- 0 until k; j <- i until k) yield
            sum((dec(col(types(i))) * dec(col(types(j))))
              .cast("decimal(30,12)")).as(s"p_${i}_$j"))
        val row = wide.agg(count(lit(1)).as("n"), aggs: _*).head()
        require(row.getAs[Long]("n") > k + 1,
          s"fin_min_variance_portfolio: only ${row.getAs[Long]("n")} complete " +
            s"all-series bars — covariance of $k series needs more observations")
        val n = row.getAs[Long]("n").toDouble
        val sums = types.map(t =>
          row.getAs[java.math.BigDecimal](s"s_$t").doubleValue)
        val cov = Array.tabulate(k, k) { (i, j) =>
          val (a, b) = (math.min(i, j), math.max(i, j))
          val sij = row.getAs[java.math.BigDecimal](s"p_${a}_$b").doubleValue
          (sij - sums(i) * sums(j) / n) / n
        }
        // solve cov * w0 = 1-vector by Gaussian elimination, partial pivot
        val a = Array.tabulate(k)(i => cov(i).clone() :+ 1.0)
        for (c <- 0 until k) {
          val p = (c until k).maxBy(r => math.abs(a(r)(c)))
          val t = a(c); a(c) = a(p); a(p) = t
          for (r <- 0 until k if r != c) {
            val f = a(r)(c) / a(c)(c)
            for (cc <- c to k) a(r)(cc) -= f * a(c)(cc)
          }
        }
        val w0 = Array.tabulate(k)(i => a(i)(k) / a(i)(i))
        val s0 = w0.sum
        val w = w0.map(_ / s0)
        val portVar = 1.0 / s0
        val ewVar = {
          var acc = 0.0
          for (i <- 0 until k; j <- 0 until k) acc += cov(i)(j)
          acc / (k.toDouble * k)
        }
        def r6(v: Double): Double =
          BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble + 0.0
        def r12(v: Double): Double =
          BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
            .toDouble + 0.0
        types.indices.map(i => (types(i), r6(w(i)), n.toLong,
            r12(portVar), r12(ewVar), r6(portVar / ewVar)))
          .toDF("series", "weight", "n_obs", "port_variance",
            "equal_weight_variance", "variance_ratio")
          .orderBy("series")
      } finally { wide.unpersist(); () }
    })
  )

  // ---- DuckDB oracle twins ------------------------------------------------

  val sql: Map[String, String] = Map(

    "seq_path_trigrams" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
        |l AS (
        |  SELECT event_type AS s1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS s2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS s3
        |  FROM e),
        |c AS (
        |  SELECT s1, s2, s3, count(*)::BIGINT AS n
        |  FROM l WHERE s3 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT s1, s2, s3, n, round(n / sum(n) OVER (), 6) AS share
        |FROM c ORDER BY n DESC, s1, s2, s3 LIMIT 20""".stripMargin,

    "agg_quantile_bottomk" ->
      """WITH base AS (
        |  SELECT event_type, event_id, round(value, 6) AS v,
        |    ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT AS hv
        |  FROM events),
        |rk AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv, event_id)
        |      AS rk
        |  FROM base),
        |est AS (
        |  SELECT event_type,
        |    quantile_cont(v, [0.1, 0.25, 0.5, 0.75, 0.9]) AS est,
        |    count(*)::BIGINT AS n_sample
        |  FROM rk WHERE rk <= 256 GROUP BY event_type),
        |exact AS (
        |  SELECT event_type,
        |    quantile_cont(v, [0.1, 0.25, 0.5, 0.75, 0.9]) AS ex,
        |    count(*)::BIGINT AS n_total
        |  FROM base GROUP BY event_type),
        |j AS (SELECT est.event_type, n_total, n_sample, est, ex
        |      FROM est JOIN exact ON est.event_type = exact.event_type),
        |ql AS (SELECT unnest(generate_series(1, 5)) AS i)
        |SELECT event_type, n_total, n_sample,
        |  [0.1, 0.25, 0.5, 0.75, 0.9][i] AS q,
        |  round(est[i], 6) + 0.0 AS est_q,
        |  round(ex[i], 6) + 0.0 AS exact_q,
        |  round(abs(est[i] - ex[i]), 6) AS abs_err
        |FROM j CROSS JOIN ql
        |ORDER BY event_type, q""".stripMargin,

    "stat_permutation_fdr" -> permutationFdrSqlDuck("events", duckDialect),

    "feature_select_mrmr" -> mrmrSqlDuck("events", duckDialect)
  )
}
