package graft

import graft.operators.Pelt

/** Kernel laws for PELT (`operators/Pelt.scala`) and the registered
  * `ml_changepoint_pelt` query's segmentation invariants. The pruning
  * inequality must never change the OPTIMUM — pinned against the
  * unpruned O(n²) DP — and planted mean shifts must be recovered at
  * their exact positions.
  */
class PeltSpec extends SparkSpec {

  test("no change: a flat-ish series yields a single segment") {
    val rnd = new scala.util.Random(1)
    val x = Array.fill(200)(5.0 + rnd.nextGaussian() * 0.1)
    assert(Pelt.segment(x, 2.0 * 0.01 * math.log(200.0) * 10).isEmpty)
  }

  test("planted mean shifts are recovered at their exact positions") {
    val rnd = new scala.util.Random(2)
    val x = Array.tabulate(300) { i =>
      val mean = if (i < 100) 0.0 else if (i < 200) 4.0 else -3.0
      mean + rnd.nextGaussian() * 0.3
    }
    val cps = Pelt.segment(x, 2.0 * 0.09 * math.log(300.0))
    assert(cps.length == 2, s"expected 2 changepoints, got ${cps.toSeq}")
    assert(math.abs(cps(0) - 100) <= 2 && math.abs(cps(1) - 200) <= 2,
      s"positions ${cps.toSeq}")
  }

  test("pruned PELT equals the exhaustive optimal-partition DP") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 10) {
      val n = 50 + rnd.nextInt(100)
      val x = Array.tabulate(n) { i =>
        (i / 25) * rnd.nextInt(3) + rnd.nextGaussian()
      }
      for (pen <- Seq(0.5, 2.0, 10.0)) {
        val a = Pelt.segment(x, pen).toSeq
        val b = Pelt.segmentExhaustive(x, pen).toSeq
        assert(a == b, s"trial $trial pen $pen: pruned $a vs exact $b")
      }
    }
  }

  test("ml_changepoint_pelt: segments tile each series exactly") {
    val out = SparkEntry.queries("ml_changepoint_pelt")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("event_type")).foreach { case (tpe, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("seg_idx"))
      assert(sorted.head.getAs[Long]("seg_idx") == 0L)
      // segment bar counts sum to the series length; boundaries are ordered
      sorted.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0).getAs[Long]("end_bucket") < w(1).getAs[Long]("start_bucket") ||
            w(0).getAs[Long]("end_bucket") <= w(1).getAs[Long]("start_bucket"),
            s"$tpe segments out of order")
      }
      val nBars = sorted.map(_.getAs[Long]("n_bars")).sum
      val series = Tables.events(spark, "/root/testdata/sf0.001")
        .filter(org.apache.spark.sql.functions.col("event_type") === tpe)
        .selectExpr("ts_ns div 1800000000000L as bucket").distinct().count()
      assert(nBars == series, s"$tpe: segments cover $nBars of $series bars")
    }
  }
}
