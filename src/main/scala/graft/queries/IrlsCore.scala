package graft.queries

import java.math.{BigDecimal => JBD, RoundingMode => RM}

/** SINGLE SOURCE OF TRUTH for the fixed-step IRLS oracle family
  * (`ml_huber`, `ml_quantile_regression`): the constants, the driver
  * replay arithmetic, and the SQL generators that the DuckDB twins are
  * built from live HERE — an edit to a weight formula, step count or
  * grid scale changes BOTH sides or neither (VERDICT r15 #5: the huber
  * conversion originally hand-mirrored ~120 LoC of Spark decimal-cast
  * semantics in two places).
  *
  * The shared discipline (the r15 `ml_huber` conversion, VERDICT r15):
  * every moment is folded in exact DECIMAL (order-free — aggregation
  * order can never move a bit), every decimal cast replays Spark's own
  * Cast semantics (shortest-string BigDecimal, HALF_UP), and the dense
  * solve is a shared-order no-pivot Cholesky whose every fold is
  * left-associated ascending-index — the SQL generators emit the
  * IDENTICAL expression tree, and since +,−,×,÷,sqrt are all
  * IEEE-correctly-rounded, identical order ⇒ bit-identical doubles.
  */
private[graft] object IrlsCore {

  // ---- constants (BOTH sides read these — never inline a copy) --------

  /** Huber IRLS step count after the OLS start. */
  val HuberSteps = 4
  /** Huber tuning: c = HuberTuning · (median|r_OLS| / MadConsistency). */
  val HuberTuning = 1.35
  /** MAD normal-consistency divisor. */
  val MadConsistency = 0.6745
  /** Expectile-IRLS step count for `ml_quantile_regression`. The
    * asymmetric-least-squares weight w ∈ {τ, 1−τ} (Newey & Powell
    * 1987) gives the ladder a FINITE state space — each step's weights
    * are a sign PATTERN, the pattern stabilizes in ≤3 steps from the
    * OLS start on the harness frame (measured), and every further step
    * is IDEMPOTENT: β is re-derived from the same discrete pattern and
    * the same exact DECIMAL moments, so cross-engine term-cast drift
    * is MEMORYLESS — it cannot compound across iterations. (The
    * smoothed-pinball IRLS the huber precedent suggested was measured
    * CHAOTIC here — a 1e-9 start perturbation grew to an O(0.1)
    * parameter gap at every tested (ε, damping, ridge, steps) point,
    * because the 1/max(|r|, ε) weight amplifies near-pinned rows; see
    * COVERAGE.md r16.) */
  val QuantileSteps = 12
  /** The reported quantile levels. */
  val QuantileTaus: Seq[Double] = Seq(0.1, 0.5, 0.9)

  // ---- driver replay arithmetic ---------------------------------------

  /** cast(x AS DECIMAL(38,10)) replayed: Spark's Cast goes through
    * BigDecimal.decimal(double) = valueOf = shortest string, then
    * HALF_UP changePrecision. */
  def d10(x: Double): JBD =
    new JBD(java.lang.Double.toString(x)).setScale(10, RM.HALF_UP)

  /** round(x, 9) then cast DECIMAL(22,9) replayed the same way. */
  def d9(x: Double): JBD =
    new JBD(java.lang.Double.toString(x)).setScale(9, RM.HALF_UP)

  /** Spark Percentile.getPercentile at arbitrary q over the sorted
    * multiset — pos = q·(n−1), linear interpolation with the
    * equal-keys early return. The SQL twin replays this EXACT formula
    * (never `quantile_cont`, whose `lo + frac·(hi−lo)` order can
    * differ in the last ulp). */
  def pctAt(sorted: Array[Double], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lower = math.floor(pos).toInt
    val higher = math.ceil(pos).toInt
    val lk = sorted(lower); val hk = sorted(higher)
    if (lower == higher || hk == lk) lk
    else (higher - pos) * lk + (pos - lower) * hk
  }

  /** Spark Percentile.getPercentile at p = 0.5 over the sorted multiset. */
  def median50(sorted: Array[Double]): Double = pctAt(sorted, 0.5)

  /** Shared-order no-pivot Cholesky solve of A β = g — the identical
    * fold order [[cholCtes]] / [[cholLaterals]] generate as SQL. */
  def solve(a: Array[Array[Double]], g: Array[Double]): Array[Double] = {
    val p = g.length
    val lm = Array.ofDim[Double](p, p)
    for (j <- 0 until p) {
      var dAcc = a(j)(j)
      for (m <- 0 until j) dAcc -= lm(j)(m) * lm(j)(m)
      lm(j)(j) = math.sqrt(dAcc)
      for (i <- j + 1 until p) {
        var acc = a(i)(j)
        for (m <- 0 until j) acc -= lm(i)(m) * lm(j)(m)
        lm(i)(j) = acc / lm(j)(j)
      }
    }
    val zv = Array.ofDim[Double](p)
    for (i <- 0 until p) {
      var acc = g(i)
      for (m <- 0 until i) acc -= lm(i)(m) * zv(m)
      zv(i) = acc / lm(i)(i)
    }
    val beta = Array.ofDim[Double](p)
    for (i <- p - 1 to 0 by -1) {
      var acc = zv(i)
      for (m <- i + 1 until p) acc -= lm(m)(i) * beta(m)
      beta(i) = acc / lm(i)(i)
    }
    beta
  }

  /** Left-associated prediction fold — the SQL `b_0*1.0 + b_1*x_1 + …`
    * parse order. */
  def pred(b: Array[Double], x: Array[Double]): Double = {
    val p = b.length
    var acc = b(0) * x(0); var i = 1
    while (i < p) { acc += b(i) * x(i); i += 1 }
    acc
  }

  /** Weighted normal-equation moments folded in exact DECIMAL — the
    * replay of `sum(CAST(xi * xj * w AS DECIMAL(38,10)))`. `wOf` is the
    * weight formula (the one place the M-estimators differ). */
  def moments(rows: Array[(Double, Array[Double])], p: Int)
             (wOf: (Double, Array[Double]) => Double)
  : (Array[Array[Double]], Array[Double]) = {
    val hs = Array.fill(p, p)(JBD.ZERO)
    val gs = Array.fill(p)(JBD.ZERO)
    rows.foreach { case (y, x) =>
      val w = wOf(y, x)
      for (i <- 0 until p; j <- i until p)
        hs(i)(j) = hs(i)(j).add(d10(x(i) * x(j) * w))
      for (i <- 0 until p)
        gs(i) = gs(i).add(d10(x(i) * y * w))
    }
    (Array.tabulate(p, p)((i, j) =>
      hs(math.min(i, j))(math.max(i, j)).doubleValue),
      gs.map(_.doubleValue))
  }

  /** OLS moments — folded WITHOUT the ×w factor (the oracle's
    * `xi * xj` text, not `xi * xj * w`). */
  def olsMoments(rows: Array[(Double, Array[Double])], p: Int)
  : (Array[Array[Double]], Array[Double]) = {
    val hs = Array.fill(p, p)(JBD.ZERO)
    val gs = Array.fill(p)(JBD.ZERO)
    rows.foreach { case (y, x) =>
      for (i <- 0 until p; j <- i until p)
        hs(i)(j) = hs(i)(j).add(d10(x(i) * x(j)))
      for (i <- 0 until p) gs(i) = gs(i).add(d10(x(i) * y))
    }
    (Array.tabulate(p, p)((i, j) =>
      hs(math.min(i, j))(math.max(i, j)).doubleValue),
      gs.map(_.doubleValue))
  }

  /** The Huber weight w = min(1, c/|r|) — CONTINUOUS at the switch, so
    * the CASE branch carries no knife-edge. Twin: [[huberWeightSql]]. */
  def huberWeight(c: Double)(absR: Double): Double =
    if (absR <= c) 1.0 else c / absR

  /** The expectile (asymmetric-least-squares) weight w = τ for r ≥ 0
    * else 1−τ. BOUNDED and sign-pattern-discrete — the properties that
    * make the ladder cross-engine replayable (see [[QuantileSteps]]).
    * The sign decision rides a residual both engines compute
    * bit-identically. Twin: [[expectileWeightSql]]. */
  def expectileWeight(tau: Double)(r: Double): Double =
    if (r >= 0) tau else 1.0 - tau

  /** The full `ml_quantile_regression` ladder on a collected frame:
    * OLS start, [[QuantileSteps]] expectile-IRLS steps at asymmetry τ
    * (exact DECIMAL moments each step), then the intercept is
    * RECALIBRATED by the exact Spark-percentile_τ of the expectile
    * residuals — so in-sample coverage P(y ≤ ŷ_τ) ≈ τ to within one
    * order statistic BY CONSTRUCTION. Returns (β, δ_τ); the final
    * predictor is x·β + δ_τ. Exposed here so MlSpec can pin the
    * planted-quantile laws on the exact replay arithmetic. */
  def expectileQuantileLadder(rows: Array[(Double, Array[Double])], p: Int,
                              tau: Double,
                              steps: Int = QuantileSteps): (Array[Double], Double) = {
    var b = { val (h, g) = olsMoments(rows, p); solve(h, g) }
    for (_ <- 1 to steps) {
      val bc = b
      val (h, g) = moments(rows, p) { (y, x) =>
        expectileWeight(tau)(y - pred(bc, x))
      }
      b = solve(h, g)
    }
    val bf = b
    val delta = pctAt(rows.map { case (y, x) => y - pred(bf, x) }.sorted, tau)
    (b, delta)
  }

  // ---- SQL generators (the DuckDB-twin side of the same semantics) ----

  /** The 30-minute fine modeling frame as DuckDB CTEs `f0/fp/ff/fr`
    * (pivot of `Grid.mean6` bucket means, ffill/bfill, lead(click) → y,
    * complete-case filter) — the `ModelingFrame.buildFine` twin. */
  def finePrelude(types: Seq[String]): String = {
    val px = types.map(t => s"max(CASE WHEN event_type = '$t' THEN m END) AS $t")
    val fill = types.map(t =>
      s"coalesce(last_value($t IGNORE NULLS) OVER (ORDER BY bucket_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        s"first_value($t IGNORE NULLS) OVER (ORDER BY bucket_id " +
        s"ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS $t")
    s"""f0 AS MATERIALIZED (
       |  SELECT event_type, epoch_ns(ts) // 1800000000000 AS bucket_id,
       |    ${Grid.mean6Sql("value")} AS m
       |  FROM events GROUP BY 1, 2),
       |fp AS MATERIALIZED (
       |  SELECT bucket_id, ${px.mkString(",\n    ")}
       |  FROM f0 GROUP BY bucket_id),
       |ff AS MATERIALIZED (
       |  SELECT bucket_id, ${fill.mkString(",\n    ")}
       |  FROM fp),
       |fr AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT *, lead(click) OVER (ORDER BY bucket_id) AS y FROM ff) t
       |  WHERE y IS NOT NULL
       |    AND ${types.map(t => s"$t IS NOT NULL").mkString(" AND ")})""".stripMargin
  }

  /** The regressor text: intercept column 1.0, then the raw features. */
  def xRef(types: Seq[String])(i: Int): String =
    if (i == 0) "1.0" else types(i - 1)

  /** Prediction text `<alias>.b_0 * 1.0 + <alias>.b_1 * x_1 + …` —
    * left-associated exactly as [[pred]] folds. */
  def predExprCols(types: Seq[String], alias: String): String = {
    val p = types.length + 1
    (0 until p).map(i => s"$alias.b_$i * ${xRef(types)(i)}").mkString(" + ")
  }

  /** Prediction text over a carried LIST column `<alias>.bl`
    * (1-indexed) — same fold order as [[predExprCols]]. */
  def predExprList(types: Seq[String], alias: String): String = {
    val p = types.length + 1
    (0 until p).map(i => s"$alias.bl[${i + 1}] * ${xRef(types)(i)}").mkString(" + ")
  }

  /** Cholesky chain generator: from src (a_i_j upper-tri + r_i), emit
    * diag/below/forward/backward CTEs; the solution lands in <pfx>w0
    * as b_0..b_{p-1}. */
  def cholCtes(pfx: String, src: String, p: Int): String = {
    def aRef(i: Int, j: Int) = s"a_${math.min(i, j)}_${math.max(i, j)}"
    val chain = (0 until p).flatMap { j =>
      val dT = (0 until j).map(m => s" - l_${j}_$m * l_${j}_$m").mkString
      val s0 = if (j == 0) src else s"${pfx}o${j - 1}"
      val diag = s"${pfx}d$j AS MATERIALIZED (SELECT *, " +
        s"sqrt(${aRef(j, j)}$dT) AS l_${j}_$j FROM $s0)"
      if (j == p - 1) Seq(diag)
      else {
        val below = (j + 1 until p).map { i =>
          val t = (0 until j).map(m => s" - l_${i}_$m * l_${j}_$m").mkString
          s"(${aRef(i, j)}$t) / l_${j}_$j AS l_${i}_$j"
        }.mkString(",\n    ")
        Seq(diag, s"${pfx}o$j AS MATERIALIZED (SELECT *,\n    $below FROM ${pfx}d$j)")
      }
    }
    val fwd = (0 until p).map { i =>
      val t = (0 until i).map(m => s" - l_${i}_$m * z_$m").mkString
      val s0 = if (i == 0) s"${pfx}d${p - 1}" else s"${pfx}f${i - 1}"
      s"${pfx}f$i AS MATERIALIZED (SELECT *, (r_$i$t) / l_${i}_$i AS z_$i FROM $s0)"
    }
    val bwd = (p - 1 to 0 by -1).map { i =>
      val t = (i + 1 until p).map(m => s" - l_${m}_$i * b_$m").mkString
      val s0 = if (i == p - 1) s"${pfx}f${p - 1}" else s"${pfx}w${i + 1}"
      s"${pfx}w$i AS MATERIALIZED (SELECT *, (z_$i$t) / l_${i}_$i AS b_$i FROM $s0)"
    }
    (chain ++ fwd ++ bwd).mkString(",\n")
  }

  /** The SAME Cholesky fold as chained LATERALs for use INSIDE a
    * recursive-CTE step (the `ml_quantile_regression` shape: iterations
    * come from the recursion, so the solve appears ONCE in the text).
    * Expects the moments row aliased `mm` with a_i_j / r_i columns;
    * the solution lands in cw0.b_0 … cw{p-1}.b_{p-1}. */
  def cholLaterals(p: Int): String = {
    val where = scala.collection.mutable.Map.empty[String, String]
    def ref(name: String) = s"${where(name)}.$name"
    def aRef(i: Int, j: Int) = s"mm.a_${math.min(i, j)}_${math.max(i, j)}"
    val lats = scala.collection.mutable.ArrayBuffer.empty[String]
    for (j <- 0 until p) {
      val dT = (0 until j).map(m =>
        s" - ${ref(s"l_${j}_$m")} * ${ref(s"l_${j}_$m")}").mkString
      lats += s"LATERAL (SELECT sqrt(${aRef(j, j)}$dT) AS l_${j}_$j) cd$j"
      where(s"l_${j}_$j") = s"cd$j"
      if (j < p - 1) {
        val below = (j + 1 until p).map { i =>
          val t = (0 until j).map(m =>
            s" - ${ref(s"l_${i}_$m")} * ${ref(s"l_${j}_$m")}").mkString
          s"(${aRef(i, j)}$t) / cd$j.l_${j}_$j AS l_${i}_$j"
        }.mkString(", ")
        lats += s"LATERAL (SELECT $below) co$j"
        for (i <- j + 1 until p) where(s"l_${i}_$j") = s"co$j"
      }
    }
    for (i <- 0 until p) {
      val t = (0 until i).map(m =>
        s" - ${ref(s"l_${i}_$m")} * ${ref(s"z_$m")}").mkString
      lats += s"LATERAL (SELECT (mm.r_$i$t) / ${ref(s"l_${i}_$i")} AS z_$i) cf$i"
      where(s"z_$i") = s"cf$i"
    }
    for (i <- p - 1 to 0 by -1) {
      val t = (i + 1 until p).map(m =>
        s" - ${ref(s"l_${m}_$i")} * ${ref(s"b_$m")}").mkString
      lats += s"LATERAL (SELECT (${ref(s"z_$i")}$t) / ${ref(s"l_${i}_$i")} AS b_$i) cw$i"
      where(s"b_$i") = s"cw$i"
    }
    lats.mkString(",\n    ")
  }

  /** OLS normal-equation moment aggregates `xx_i_j` / `xy_i` in exact
    * DECIMAL over `fr` — `m0` body text. */
  def olsMomentsSql(types: Seq[String]): (String, String) = {
    val p = types.length + 1
    val x = xRef(types) _
    val xx = (for (i <- 0 until p; j <- i until p) yield
      s"sum(CAST(${x(i)} * ${x(j)} AS DECIMAL(38,10))) AS xx_${i}_$j")
      .mkString(",\n    ")
    val xy = (0 until p).map(i =>
      s"sum(CAST(${x(i)} * y AS DECIMAL(38,10))) AS xy_$i").mkString(",\n    ")
    (xx, xy)
  }

  /** The double-cast projection `a_i_j` / `r_i` from `xx/xy` moments. */
  def momentsToDoubleSql(p: Int): String =
    ((for (i <- 0 until p; j <- i until p) yield
      s"CAST(xx_${i}_$j AS DOUBLE) AS a_${i}_$j") ++
      (0 until p).map(i => s"CAST(xy_$i AS DOUBLE) AS r_$i")).mkString(",\n    ")

  /** WEIGHTED moment aggregates (the `xi * xj * w` text). */
  def weightedMomentsSql(types: Seq[String]): (String, String) = {
    val p = types.length + 1
    val x = xRef(types) _
    val xx = (for (i <- 0 until p; j <- i until p) yield
      s"sum(CAST(${x(i)} * ${x(j)} * w AS DECIMAL(38,10))) AS xx_${i}_$j")
      .mkString(",\n    ")
    val xy = (0 until p).map(i =>
      s"sum(CAST(${x(i)} * y * w AS DECIMAL(38,10))) AS xy_$i").mkString(",\n    ")
    (xx, xy)
  }

  /** Huber weight text — twin of [[huberWeight]]. */
  def huberWeightSql(predSql: String, cRef: String): String =
    s"CASE WHEN abs(y - ($predSql)) <= $cRef THEN 1.0\n" +
      s"        ELSE $cRef / abs(y - ($predSql)) END"

  /** Expectile weight text — twin of [[expectileWeight]]; `tauRef`
    * must be a DOUBLE column/literal. */
  def expectileWeightSql(predSql: String, tauRef: String): String =
    s"CASE WHEN y - ($predSql) >= 0 THEN $tauRef ELSE 1.0 - $tauRef END"

  /** Spark-percentile interpolation text over a sorted LIST column
    * `el` with count `n` at level `tauRef` — twin of [[pctAt]]
    * (identical formula and branch, never `quantile_cont`). Expects
    * `pos`, `lo`, `hi` columns already derived as
    * `tauRef * (n - 1)`, `floor(pos)::INT`, `ceil(pos)::INT`. */
  def pctAtSql: String =
    "CASE WHEN lo = hi OR el[hi + 1] = el[lo + 1] THEN el[lo + 1] " +
      "ELSE (hi - pos) * el[lo + 1] + (pos - lo) * el[hi + 1] END"
}
