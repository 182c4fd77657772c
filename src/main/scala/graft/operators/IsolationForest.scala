package graft.operators

/** Isolation forest (Liu, Ting & Zhou 2008) in the production division
  * of labor: the FOREST is model-sized and trains driver-side on a
  * bounded deterministic sample (ψ ≤ 256 per tree — the paper's own
  * subsampling, which is what makes iForest work at any corpus scale),
  * and SCORING is a narrow executor-side map walking the broadcast
  * trees — no shuffle, no driver loop over data.
  *
  * Determinism: every random choice draws from a seeded per-tree RNG;
  * same sample + same seed ⇒ bitwise-identical forest and scores.
  */
object IsolationForest {

  /** Binary isolation tree over column-indexed feature vectors. */
  sealed trait Node extends Serializable
  final case class Leaf(size: Int) extends Node
  final case class Split(feature: Int, threshold: Double,
                         lo: Node, hi: Node) extends Node

  /** Average unsuccessful-search path length of a BST of n nodes —
    * the c(n) normalizer from the paper. */
  def c(n: Double): Double =
    if (n <= 1.0) 0.0
    else 2.0 * (math.log(n - 1) + 0.5772156649) - 2.0 * (n - 1) / n

  private def build(rows: Array[Array[Double]], depth: Int, limit: Int,
                    rnd: scala.util.Random): Node = {
    if (depth >= limit || rows.length <= 1) Leaf(rows.length)
    else {
      val dim = rows(0).length
      // pick among features that still vary in this node
      val candidates = (0 until dim).filter { f =>
        var lo = rows(0)(f); var hi = rows(0)(f)
        rows.foreach { r => lo = math.min(lo, r(f)); hi = math.max(hi, r(f)) }
        hi > lo
      }
      if (candidates.isEmpty) Leaf(rows.length)
      else {
        val f = candidates(rnd.nextInt(candidates.length))
        var lo = rows(0)(f); var hi = rows(0)(f)
        rows.foreach { r => lo = math.min(lo, r(f)); hi = math.max(hi, r(f)) }
        val t = lo + rnd.nextDouble() * (hi - lo)
        val (l, r) = rows.partition(_(f) < t)
        if (l.isEmpty || r.isEmpty) Leaf(rows.length)
        else Split(f, t, build(l, depth + 1, limit, rnd),
          build(r, depth + 1, limit, rnd))
      }
    }
  }

  /** Train `nTrees` isolation trees, each on a seeded subsample of up
    * to `psi` rows from `sample` (the caller supplies the bounded,
    * deterministically-ordered sample). */
  def fit(sample: Array[Array[Double]], nTrees: Int = 100, psi: Int = 256,
          seed: Long = 42L): Array[Node] = {
    require(sample.nonEmpty, "empty training sample")
    (0 until nTrees).toArray.map { t =>
      val rnd = new scala.util.Random(seed + t)
      val sub = rnd.shuffle(sample.indices.toList).take(math.min(psi, sample.length))
        .map(sample).toArray
      val limit = math.ceil(math.log(math.min(psi, sample.length).toDouble) /
        math.log(2.0)).toInt
      build(sub, 0, math.max(1, limit), rnd)
    }
  }

  /** Path length of x through one tree, with the c(size) leaf
    * adjustment from the paper. */
  def pathLength(x: Array[Double], node: Node, depth: Int = 0): Double =
    node match {
      case Leaf(size) => depth + c(size.toDouble)
      case Split(f, t, lo, hi) =>
        if (x(f) < t) pathLength(x, lo, depth + 1)
        else pathLength(x, hi, depth + 1)
    }

  /** Anomaly score s(x) = 2^(−E[h(x)]/c(ψ)) ∈ (0, 1]; > 0.5 reads as
    * anomalous, ~0.5 as ordinary (the paper's interpretation). */
  def score(x: Array[Double], forest: Array[Node], psi: Int): Double = {
    val eh = forest.map(t => pathLength(x, t)).sum / forest.length
    math.pow(2.0, -eh / c(psi.toDouble))
  }
}
