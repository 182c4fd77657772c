package graft.operators

import graft.queries.Grid

/** The additive Holt–Winters filtering recursion at the canonical
  * smoothing point (α=0.2, β=0.1, γ=0.1, season 48) — ONE arithmetic
  * shared by the batch `ml_holt_winters_filter` scan and the streaming
  * `stream_holt_winters` twin, so both hash-match the SAME DuckDB
  * recursive-CTE oracle bit for bit. Textbook init: first-season mean
  * level, season-gap trend, first-season deviations; the init consumes
  * the first 2·M bucket means (b₀ needs the second season's mean), then
  * replays steps M..2M−1 — exactly the batch loop's order. Every state
  * re-rounds to the 1e-9 grid HALF_UP with the `+ 0.0` signed-zero
  * guard (the house recursion discipline). */
object HwFilter {

  val M = 48
  val Alpha = 0.2
  val Beta = 0.1
  val Gamma = 0.1

  /** Recursion state. `warm` holds the first 2·M means until the init
    * point; afterwards (`started`) the state is O(M): level, trend, the
    * M-slot seasonal ring (head = the slot the NEXT step consumes),
    * one-step-ahead SSE and its count. */
  final case class St(warm: Vector[Double], started: Boolean,
                      level: Double, trend: Double, seas: Vector[Double],
                      sse: Double, nErr: Long, nObs: Long)

  val empty: St = St(Vector.empty, started = false, 0.0, 0.0,
    Vector.empty, 0.0, 0L, 0L)

  /** DECIMAL-exact sum, DOUBLE division, round 6 — `Grid.mean6Sql`'s
    * text, order-free (used for bucket means and the init means). */
  def mean6(xs: Seq[Double]): Double = {
    val s = xs.map(x => BigDecimal(x)).reduceLeft(_ + _)
    Grid.r9(s.toDouble / xs.length, 6)
  }

  private def step(st: St, y: Double): St = {
    val sOld = st.seas.head
    val f = Grid.r9(st.level + st.trend + sOld, 6)
    val e = y - f
    val lPrev = st.level
    val nl = Grid.r9(Alpha * (y - sOld) + 0.8 * (lPrev + st.trend)) + 0.0
    val nt = Grid.r9(Beta * (nl - lPrev) + 0.9 * st.trend) + 0.0
    val ns = Grid.r9(Gamma * (y - nl) + 0.9 * sOld) + 0.0
    St(st.warm, st.started, nl, nt, st.seas.tail :+ ns,
      st.sse + e * e, st.nErr + 1, st.nObs)
  }

  /** Consume the next bucket mean in series order. */
  def push(st: St, y: Double): St =
    if (st.started) step(st, y).copy(nObs = st.nObs + 1)
    else {
      val warm = st.warm :+ y
      if (warm.length < 2 * M) st.copy(warm = warm, nObs = warm.length)
      else {
        val m1 = mean6(warm.take(M))
        val m2 = mean6(warm.slice(M, 2 * M))
        var s = St(Vector.empty, started = true, m1,
          Grid.r9((m2 - m1) / M) + 0.0,
          warm.take(M).map(v => Grid.r9(v - m1, 6) + 0.0),
          0.0, 0L, warm.length)
        for (t <- M until 2 * M) s = step(s, warm(t))
        s
      }
    }

  /** One grid-rounded step at ARBITRARY (α, β, γ) — the `ml_holt_winters`
    * grid-search recursion (r15 full-oracle conversion). Identical to
    * [[step]] except the smoothing constants are parameters and the
    * complements are COMPUTED as `1 - a` (matching the oracle's
    * `(1 - a)` text) rather than literal 0.8/0.9 — at a general grid
    * point there is no exact-literal complement to hardcode. */
  def stepParam(st: St, y: Double, a: Double, b: Double, g: Double): St = {
    val sOld = st.seas.head
    val f = Grid.r9(st.level + st.trend + sOld, 6)
    val e = y - f
    val lPrev = st.level
    val nl = Grid.r9(a * (y - sOld) + (1 - a) * (lPrev + st.trend)) + 0.0
    val nt = Grid.r9(b * (nl - lPrev) + (1 - b) * st.trend) + 0.0
    val ns = Grid.r9(g * (y - nl) + (1 - g) * sOld) + 0.0
    St(st.warm, st.started, nl, nt, st.seas.tail :+ ns,
      st.sse + e * e, st.nErr + 1, st.nObs)
  }

  /** Whole-series pass at (α, β, γ): the same textbook init as [[push]]
    * (first-season mean level, season-gap trend, first-season
    * deviations), then the parameterized recursion over t = M..n−1 —
    * ONE arithmetic with the `ml_holt_winters` oracle's per-grid-point
    * recursive CTE. */
  def runParam(ys: Array[Double], a: Double, b: Double, g: Double): St = {
    require(ys.length > 2 * M, s"Holt–Winters needs > ${2 * M} buckets")
    val m1 = mean6(ys.take(M).toSeq)
    val m2 = mean6(ys.slice(M, 2 * M).toSeq)
    var st = St(Vector.empty, started = true, m1,
      Grid.r9((m2 - m1) / M) + 0.0,
      ys.take(M).toVector.map(v => Grid.r9(v - m1, 6) + 0.0),
      0.0, 0L, ys.length.toLong)
    var t = M
    while (t < ys.length) { st = stepParam(st, ys(t), a, b, g); t += 1 }
    st
  }

  /** The one-row summary the oracle checks: final level/trend, 1-step
    * and 1-day forecasts, one-step-ahead RMSE. Call only when started. */
  def summary(st: St): (Long, Double, Double, Double, Double, Double) = {
    require(st.started, s"Holt–Winters needs > ${2 * M} buckets")
    val f1 = Grid.r6z(st.level + 1 * st.trend + st.seas(0))
    val f48 = Grid.r6z(st.level + M * st.trend + st.seas(M - 1))
    (st.nObs, Grid.r6z(st.level), Grid.r6z(st.trend), f1, f48,
      Grid.r6(math.sqrt(st.sse / st.nErr)))
  }
}
