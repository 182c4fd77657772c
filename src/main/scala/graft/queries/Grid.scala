package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-free grouped means for 1e-6-grid inputs — the r9 red-row fix,
  * generalized (VERDICT r9 "What's wrong" #1b / "Next round" #2).
  *
  * A grouped `avg(double)` rides partial sums whose MERGE ORDER is not
  * deterministic (Spark merges task partials in completion order; DuckDB
  * has its own parallel order), so `round(avg(x), 6)` can flip at a
  * .5e-6 boundary BETWEEN RUNS OF THE SAME ENGINE — exactly the
  * driver-vs-local flake r9 shipped. When the input is already on a
  * decimal grid (raw `value` is 1e-2; any `round(x, 6)` output is 1e-6),
  * the DECIMAL(18,6) cast is exact, the DECIMAL sum is
  * order-independent, and the single double division + round is
  * deterministic — same value as the double avg away from boundaries,
  * and a WELL-DEFINED value at them.
  *
  * Only for grid inputs: casting a NON-grid double to DECIMAL(18,6)
  * would round each element (a semantic change and a per-element
  * cross-engine tie risk). Non-grid grouped avgs (the `ml_metric_*`
  * family) are documented safe in COVERAGE.md instead: their
  * order-delta is ~1 ulp of the total, ≈1e-8 flip probability per
  * site-round, and their outputs feed no comparisons.
  */
object Grid {

  /** `round(avg(c), scale)` with the sum carried in DECIMAL(18,6).
    * `count(c)` (non-nulls) replicates avg's null-skipping exactly. */
  def mean6(c: Column, scale: Int = 6): Column =
    round(sum(c.cast("decimal(18,6)")).cast("double") / count(c), scale)

  /** SQL twin of [[mean6]] — ONE text for both engines. */
  def mean6Sql(expr: String, scale: Int = 6): String =
    s"round(CAST(sum(CAST($expr AS DECIMAL(18,6))) AS DOUBLE) / count($expr), $scale)"

  /** Driver-side 1e-9-grid HALF_UP re-round — the house discipline for
    * every recursion state a DuckDB twin replays with `round(x, 9)`
    * (ts_kalman_level / seq_markov_stationary / mRMR precedent: scala
    * `BigDecimal(x)` goes through the shortest-repr decimal exactly as
    * both engines' `round` does in practice). */
  def r9(x: Double, scale: Int = 9): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver-side output rounding to the 1e-6 grid with the signed-zero
    * guard (`round(x, 6) + 0.0` — the r8 `feature_woe_encode` lesson). */
  def r6z(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  /** Driver-side 1e-6 HALF_UP round for strictly-positive quantities
    * (no signed-zero guard needed). */
  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- linear-counting register sketch (r14 oracle conversions) ----------
  // The approximate-distinct sketch BOTH engines can replay exactly:
  // values hash to K md5 registers, a group aggregates its DISTINCT-
  // register fill V (state bounded by K — the mergeable KB-class sketch
  // posture), and the estimate is linear counting −K·ln(1−V/K)
  // (Whang et al. 1990 — the estimator HLL++ itself serves in this fill
  // regime). One fragment pair so engine and oracle cannot drift.

  /** Fixed register count — sized ~40× the harness cardinality ceiling;
    * a deploy sizes K to its expected distinct ceiling. */
  val LcK = 65536

  /** md5 register id of `c` (the `feature_hashing_trick` hash idiom). */
  def lcReg(c: String): Column =
    expr(s"cast(conv(substring(md5(cast($c as string)), 1, 8), 16, 10) " +
      s"as bigint) % $LcK")

  /** Linear-counting estimate from a distinct-register fill column. */
  def lcEstimate(filled: Column): Column =
    round(lit(-LcK.toDouble) * log(lit(1.0) - filled / lit(LcK.toDouble)), 6)

  /** DuckDB twin of [[lcReg]]. */
  def lcRegSql(e: String): String =
    s"('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 8))::BIGINT % $LcK"

  /** DuckDB twin of [[lcEstimate]] — same literal/association order. */
  def lcEstimateSql(filled: String): String =
    s"round(-$LcK.0 * ln(1.0 - $filled / $LcK.0), 6)"
}
