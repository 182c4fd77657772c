package graft.operators

/** Dynamic time warping with a Sakoe–Chiba band (Sakoe & Chiba 1978;
  * the banded restriction is what makes DTW usable at scale — O(n·r)
  * per pair instead of O(n·m), and the band radius is the knob a
  * similarity-search pipeline tunes).
  *
  * The kernel is a plain Scala function on arrays so the QUERY layer
  * can run it per-pair inside executor-side typed maps (each series
  * pair is one bounded task — thousands of pairs fan out across the
  * cluster, no driver loop), and the spec can pin it against the
  * unbanded O(n·m) reference directly.
  */
object Dtw {

  /** Banded DTW distance with L1 local cost. The effective radius is
    * max(radius, |n−m|) so the (n−1, m−1) corner is always reachable
    * (the fastdtw convention for unequal lengths). */
  def banded(x: Array[Double], y: Array[Double], radius: Int): Double = {
    val n = x.length
    val m = y.length
    require(n > 0 && m > 0, "DTW over empty series")
    val r = math.max(radius, math.abs(n - m))
    val inf = Double.PositiveInfinity
    // two-row rolling DP; row i holds dp(i, j) for j in the band
    var prev = Array.fill(m)(inf)
    var cur = Array.fill(m)(inf)
    var i = 0
    while (i < n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(0, i - r)
      val hi = math.min(m - 1, i + r)
      var j = lo
      while (j <= hi) {
        val c = math.abs(x(i) - y(j))
        val best =
          if (i == 0 && j == 0) 0.0
          else {
            val a = if (i > 0) prev(j) else inf          // insertion
            val b = if (j > 0) cur(j - 1) else inf       // deletion
            val d = if (i > 0 && j > 0) prev(j - 1) else inf // match
            math.min(a, math.min(b, d))
          }
        cur(j) = c + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m - 1)
  }

  /** Unbanded O(n·m) reference — the spec's ground truth. */
  def full(x: Array[Double], y: Array[Double]): Double =
    banded(x, y, math.max(x.length, y.length))
}
