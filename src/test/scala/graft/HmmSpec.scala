package graft

import org.apache.spark.sql.functions._

import graft.ml.Hmm

/** Correctness gate for the Gaussian HMM (`ml/Hmm.scala`) — rows-only in
  * the registry (EM + dynamic programming have no SQL form), so these
  * tests carry the verification: planted-regime recovery on a simulated
  * switching series, the EM likelihood-ascent law, and Viterbi checked
  * against brute-force path enumeration.
  */
class HmmSpec extends SparkSpec {

  /** Deterministic 2-state Markov-switching Gaussian sample. */
  private def simulate(n: Int, stay: Double, means: (Double, Double),
                       sd: Double, seed: Long): (Array[Double], Array[Int]) = {
    val rng = new java.util.Random(seed)
    val x = new Array[Double](n); val s = new Array[Int](n)
    var st = 0
    for (t <- 0 until n) {
      if (t > 0 && rng.nextDouble() > stay) st = 1 - st
      s(t) = st
      x(t) = (if (st == 0) means._1 else means._2) + sd * rng.nextGaussian()
    }
    (x, s)
  }

  test("fit recovers planted means, stickiness, and the state path") {
    val (x, truth) = simulate(3000, stay = 0.95, means = (-1.0, 1.0),
      sd = 0.3, seed = 42)
    val f = Hmm.fit(x, k = 2)
    val order = f.means.zipWithIndex.sortBy(_._1).map(_._2)
    val (lo, hi) = (f.means(order(0)), f.means(order(1)))
    assert(math.abs(lo - -1.0) < 0.1, s"low-regime mean $lo")
    assert(math.abs(hi - 1.0) < 0.1, s"high-regime mean $hi")
    assert(f.trans(order(0))(order(0)) > 0.85 && f.trans(order(1))(order(1)) > 0.85,
      "planted stickiness 0.95 must be recovered as sticky")
    val path = Hmm.viterbi(x, f)
    // map decoded state indices onto the mean-ordered labels
    val acc = path.zip(truth).count { case (p, t) => order.indexOf(p) == t }
      .toDouble / x.length
    assert(acc > 0.95, s"Viterbi accuracy $acc")
  }

  test("EM log-likelihood is non-decreasing in the iteration budget") {
    val (x, _) = simulate(500, 0.9, (-0.5, 0.8), 0.4, seed = 7)
    val lls = Seq(1, 2, 5, 10, 30).map(it => Hmm.fit(x, k = 2, maxIter = it).logLik)
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-7, s"EM likelihood decreased: $a -> $b") }
  }

  test("viterbi equals brute-force enumeration on a small instance") {
    // parameters from a long fit; the decode comparison runs on a short
    // prefix where all 2^8 paths are enumerable
    val (xLong, _) = simulate(200, 0.8, (-2.0, 2.0), 0.5, seed = 3)
    val f = Hmm.fit(xLong, k = 2, maxIter = 5)
    val x = xLong.take(8)
    def logPdf(v: Double, i: Int) =
      -0.5 * (math.log(2 * math.Pi * f.vars(i)) +
        (v - f.means(i)) * (v - f.means(i)) / f.vars(i))
    var best = Double.NegativeInfinity
    var bestPath: Seq[Int] = Nil
    for (mask <- 0 until (1 << x.length)) {
      val p = (0 until x.length).map(t => (mask >> t) & 1)
      var ll = math.log(math.max(f.pi(p(0)), 1e-300)) + logPdf(x(0), p(0))
      for (t <- 1 until x.length)
        ll += math.log(math.max(f.trans(p(t - 1))(p(t)), 1e-300)) + logPdf(x(t), p(t))
      if (ll > best) { best = ll; bestPath = p }
    }
    assert(Hmm.viterbi(x, f).toSeq == bestPath,
      "Viterbi must find the exact MAP path")
  }

  test("short series fails loudly") {
    intercept[IllegalArgumentException] { Hmm.fit(Array(1.0, 2.0, 3.0), k = 2) }
  }

  test("registry query: states ordered by mean, probabilities valid, counts partition") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("ml_hmm_regimes")(spark, dir)
      .orderBy("state").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("mean_x1e3") <= rows(1).getAs[Double]("mean_x1e3"))
    rows.foreach { r =>
      assert(r.getAs[Double]("pi") >= 0.0 && r.getAs[Double]("pi") <= 1.0)
      assert(r.getAs[Double]("stay_prob") >= 0.0 && r.getAs[Double]("stay_prob") <= 1.0)
      assert(r.getAs[Double]("var_x1e3") > 0.0)
    }
    val nBuckets = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(expr("ts_ns div 1800000000000L")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_assigned")).sum == nBuckets - 1,
      "Viterbi path must assign every return (n_buckets - 1) exactly once")
  }
}
