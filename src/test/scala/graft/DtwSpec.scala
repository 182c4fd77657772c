package graft

import graft.operators.Dtw

/** Kernel laws for banded DTW (`operators/Dtw.scala`) plus the
  * registered `ts_dtw_pairs` query's invariants. The DuckDB oracle
  * can't replay a DP recursion, so this suite IS the correctness gate:
  * the banded kernel is pinned against the unbanded O(n·m) reference
  * on seeded random series, and the hand-derived fixtures pin the
  * alignment semantics themselves.
  */
class DtwSpec extends SparkSpec {

  test("identity, symmetry, and nonnegativity") {
    val x = Array(1.0, 3.0, 2.0, 5.0, 4.0)
    val y = Array(2.0, 1.0, 4.0, 4.0)
    assert(Dtw.full(x, x) == 0.0)
    assert(Dtw.full(y, y) == 0.0)
    assert(Dtw.full(x, y) == Dtw.full(y, x))
    assert(Dtw.full(x, y) > 0.0)
  }

  test("hand-derived fixture: warping absorbs a repeated sample") {
    // x = [1,2,3], y = [1,2,2,3]: the doubled 2 matches x's single 2
    // twice at zero cost — DTW 0, where lockstep L1 would pay.
    assert(Dtw.full(Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 2.0, 3.0)) == 0.0)
    // x = [0,0,0], y = [1,1]: every alignment pays |0-1| per matched
    // step; the cheapest path has max(n,m)=3 matches -> cost 3.
    assert(Dtw.full(Array(0.0, 0.0, 0.0), Array(1.0, 1.0)) == 3.0)
  }

  test("time-shift tolerance: DTW beats lockstep on a shifted copy") {
    val base = (0 until 50).map(i => math.sin(i / 5.0)).toArray
    val shifted = (0 until 50).map(i => math.sin((i - 3) / 5.0)).toArray
    val lockstep = base.zip(shifted).map { case (a, b) => math.abs(a - b) }.sum
    val dtw = Dtw.banded(base, shifted, 5)
    assert(dtw < lockstep / 4,
      s"DTW $dtw should absorb the 3-step shift (lockstep $lockstep)")
  }

  test("banded kernel equals the unbanded reference once r covers the warp") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 10) {
      val n = 20 + rnd.nextInt(30)
      val m = 20 + rnd.nextInt(30)
      val x = Array.fill(n)(rnd.nextDouble() * 10)
      val y = Array.fill(m)(rnd.nextDouble() * 10)
      val full = Dtw.full(x, y)
      val wide = Dtw.banded(x, y, math.max(n, m))
      assert(full == wide, s"trial $trial")
      // monotone in the radius: tightening the band never helps
      val costs = Seq(1, 3, 8, 15, math.max(n, m)).map(Dtw.banded(x, y, _))
      assert(costs.zip(costs.tail).forall { case (a, b) => a >= b - 1e-12 },
        s"trial $trial: band monotonicity $costs")
      assert(costs.last == full)
    }
  }

  test("ts_dtw_pairs: 10 pairs, self-consistent norms, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ts_dtw_pairs")(spark, dir).collect()
    assert(out.length == 10, "5 choose 2 series pairs")
    out.foreach { r =>
      val d = r.getAs[Double]("dtw_dist")
      val norm = r.getAs[Double]("dtw_norm")
      val n = r.getAs[Long]("n_a") + r.getAs[Long]("n_b")
      assert(d >= 0.0)
      assert(math.abs(norm - math.rint(d / n * 1e6) / 1e6) < 2e-6, "norm identity")
    }
    val again = SparkEntry.queries("ts_dtw_pairs")(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "run-to-run determinism")
  }
}
