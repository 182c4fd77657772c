package graft.operators

/** PELT — Pruned Exact Linear Time changepoint detection (Killick,
  * Fearnhead & Eckley 2012): exact optimal mean-shift segmentation
  * under a per-changepoint penalty, with the inequality pruning that
  * makes the DP linear-ish in practice. Complements the registry's
  * sequential `ml_changepoint_cusum` (single drift alarm) with the
  * full retrospective segmentation a batch pipeline wants.
  *
  * Plain-array kernel (same posture as `Dtw`): the QUERY layer runs it
  * per series inside executor-side tasks on bounded bar arrays; the
  * spec pins it against the unpruned O(n²) optimal-partition DP.
  */
object Pelt {

  /** Gaussian mean-shift cost: SSE of segment [i, j) around its mean,
    * from prefix sums — O(1) per evaluation. */
  private final class SegCost(x: Array[Double]) {
    private val s1 = new Array[Double](x.length + 1)
    private val s2 = new Array[Double](x.length + 1)
    var i = 0
    while (i < x.length) {
      s1(i + 1) = s1(i) + x(i); s2(i + 1) = s2(i) + x(i) * x(i); i += 1
    }
    def cost(i: Int, j: Int): Double = {
      val n = j - i
      val sum = s1(j) - s1(i)
      (s2(j) - s2(i)) - sum * sum / n
    }
  }

  /** Changepoint positions (segment START indices, excluding 0) of the
    * optimal segmentation of `x` under `penalty` per changepoint. */
  def segment(x: Array[Double], penalty: Double): Array[Int] = {
    val n = x.length
    require(n > 0, "PELT over an empty series")
    val c = new SegCost(x)
    val f = new Array[Double](n + 1)
    val prev = new Array[Int](n + 1)
    f(0) = -penalty
    var candidates = List(0)
    var t = 1
    while (t <= n) {
      var best = Double.PositiveInfinity
      var bestS = 0
      candidates.foreach { s =>
        val v = f(s) + c.cost(s, t) + penalty
        if (v < best) { best = v; bestS = s }
      }
      f(t) = best
      prev(t) = bestS
      // PELT pruning: s can never again be optimal once even a free
      // future split can't beat the current best
      candidates = t :: candidates.filter(s => f(s) + c.cost(s, t) <= f(t))
      t += 1
    }
    var out = List.empty[Int]
    var cur = n
    while (cur > 0) { val p = prev(cur); if (p > 0) out = p :: out; cur = p }
    out.toArray
  }

  /** Unpruned O(n²) optimal-partition DP — the spec's ground truth. */
  def segmentExhaustive(x: Array[Double], penalty: Double): Array[Int] = {
    val n = x.length
    val c = new SegCost(x)
    val f = new Array[Double](n + 1)
    val prev = new Array[Int](n + 1)
    f(0) = -penalty
    for (t <- 1 to n) {
      var best = Double.PositiveInfinity; var bestS = 0
      for (s <- 0 until t) {
        val v = f(s) + c.cost(s, t) + penalty
        if (v < best) { best = v; bestS = s }
      }
      f(t) = best; prev(t) = bestS
    }
    var out = List.empty[Int]
    var cur = n
    while (cur > 0) { val p = prev(cur); if (p > 0) out = p :: out; cur = p }
    out.toArray
  }
}
