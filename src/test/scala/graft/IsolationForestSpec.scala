package graft

import graft.operators.IsolationForest

/** Kernel laws for the isolation forest (`operators/IsolationForest`)
  * plus the registered query's invariants — 100 random trees have no
  * oracle, so planted-outlier detection and the paper's score laws are
  * the correctness gate.
  */
class IsolationForestSpec extends SparkSpec {

  private def cluster(n: Int, rnd: scala.util.Random): Array[Array[Double]] =
    Array.fill(n)(Array.fill(4)(rnd.nextGaussian() * 0.5 + 10.0))

  test("planted outliers isolate first: far points take the top scores") {
    val rnd = new scala.util.Random(1)
    val inliers = cluster(300, rnd)
    val outliers = Array(
      Array(50.0, 50.0, 50.0, 50.0),
      Array(-30.0, 10.0, 10.0, 10.0))
    val all = inliers ++ outliers
    val forest = IsolationForest.fit(all, nTrees = 100, psi = 128)
    val scores = all.map(x => IsolationForest.score(x, forest, 128))
    val ranked = scores.zipWithIndex.sortBy(-_._1).map(_._2)
    // random splits don't guarantee a strict top-2, but both planted
    // outliers must sit clearly in the head of the ranking
    assert(Set(300, 301).subsetOf(ranked.take(4).toSet),
      s"outliers must land in the top-4 scores, got ${ranked.take(6).toSeq}")
    val inMean = scores.take(300).sum / 300
    assert(scores(300) > inMean + 0.15 && scores(301) > inMean + 0.15)
  }

  test("score laws: range (0,1], inliers near or below 0.5, c() monotone") {
    val rnd = new scala.util.Random(2)
    val data = cluster(200, rnd)
    val forest = IsolationForest.fit(data, nTrees = 50, psi = 64)
    val scores = data.map(x => IsolationForest.score(x, forest, 64))
    assert(scores.forall(s => s > 0 && s <= 1.0))
    assert(scores.sum / scores.length < 0.62,
      "a homogeneous cluster must not read as anomalous on average")
    val cs = Seq(2.0, 8.0, 64.0, 256.0).map(IsolationForest.c)
    assert(cs.zip(cs.tail).forall { case (a, b) => a < b }, s"c() monotone: $cs")
  }

  test("seeded determinism of fit and score") {
    val rnd = new scala.util.Random(3)
    val data = cluster(100, rnd)
    val a = IsolationForest.fit(data, 20, 64, seed = 7L)
    val b = IsolationForest.fit(data, 20, 64, seed = 7L)
    data.take(10).foreach { x =>
      assert(IsolationForest.score(x, a, 64) == IsolationForest.score(x, b, 64))
    }
  }

  test("ml_isolation_forest query: top-10, ordered, scores in range, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = SparkEntry.queries("ml_isolation_forest")(spark, dir).collect()
    val rows = run()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.toSeq == scores.toSeq.sorted.reverse, "descending scores")
    scores.foreach(s => assert(s > 0 && s <= 1.0))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_anomalous") == (r.getAs[Double]("score") > 0.6))
    }
    assert(rows.map(_.toString).toSeq == run().map(_.toString).toSeq,
      "seeded determinism end-to-end")
  }
}
