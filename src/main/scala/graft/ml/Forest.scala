package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.DoubleType

/** Seeded, PARTITION-INDEPENDENT random-forest regressor (r14, VERDICT
  * ask #1 route b — "break the per-(partition,row) bagging pin").
  *
  * MLlib's `RandomForestRegressor` draws its bootstrap per (partition,
  * row-position) (`BaggedPoint.convertToBaggedRDD` seeds an XORShift
  * stream per partition), which semantically PINS the trained model to
  * one physical layout — the r13 floor profile measured 90 % of the
  * ensemble's wall as per-level DTStatsAggregator work serialized on
  * that single pinned partition. Here the bootstrap is a PURE FUNCTION
  * of the row's content: each row's per-tree multiplicity is
  * Poisson(1) drawn by inverse-CDF from a splitmix64 hash of
  * (seed, tree, row-content), so ANY physical layout — any partitioning,
  * any row order, driver or executor — trains the identical forest.
  *
  * Execution is budget-gated like the Borůvka merge (R10.scala): the
  * training frames this engine fits are CALENDAR-BOUNDED aggregates
  * (the 30-minute frame is ~1.4k rows at ANY data scale — day-count ×
  * 48, not fact-table-sized), so under [[driverFitLimit]] rows the fit
  * collects the aggregate-sized frame and grows all trees on parallel
  * driver threads with EXACT midpoint splits (the sklearn CART the
  * reference runs, `app.py:123`); past the budget — a frame that is not
  * calendar-bounded — `Ensemble.fitWeighted` falls back to the
  * distributed MLlib trainer (documented layout-seeded bagging).
  * Scoring is the IsolationForest serving posture: a narrow map walking
  * the broadcast forest — no shuffle, no UDF registry.
  *
  * Determinism contract (ForestSpec): same rows in ANY order/partition
  * layout ⇒ bit-identical trees, predictions, and importances. Rows are
  * canonicalized by sorting on the content hash; two byte-identical
  * rows share one hash and are interchangeable everywhere downstream,
  * so the sort is total where it needs to be.
  */
object Forest {

  /** Flat tree: `feature(i) < 0` marks a leaf predicting `pred(i)`;
    * else go left iff x(feature) <= threshold. */
  final class Tree(val feature: Array[Int], val threshold: Array[Double],
                   val left: Array[Int], val right: Array[Int],
                   val pred: Array[Double]) extends Serializable

  final case class Model(trees: Array[Tree], importances: Array[Double])
      extends Serializable {

    def predictTree(t: Tree, x: Array[Double]): Double = {
      var i = 0
      while (t.feature(i) >= 0)
        i = if (x(t.feature(i)) <= t.threshold(i)) t.left(i) else t.right(i)
      t.pred(i)
    }

    /** Mean over trees in fixed tree order (deterministic fold). */
    def predict(x: Array[Double]): Double = {
      var s = 0.0; var t = 0
      while (t < trees.length) { s += predictTree(trees(t), x); t += 1 }
      s / trees.length
    }

    /** Serving: one narrow map over the frame, forest broadcast —
      * the `ml_isolation_forest` scoring posture (no shuffle). */
    def score(df: DataFrame, featuresCol: String, out: String): DataFrame = {
      val schema = df.schema.add(out, DoubleType)
      val bc = df.sparkSession.sparkContext.broadcast(this)
      val fi = df.schema.fieldIndex(featuresCol)
      df.map { r =>
        val v = r.getAs[org.apache.spark.ml.linalg.Vector](fi)
        Row.fromSeq(r.toSeq :+ bc.value.predict(v.toArray))
      }(Encoders.row(schema))
    }
  }

  /** Rows the driver fit may collect. The engine's modeling frames are
    * calendar-bounded (~1.4k rows at any SF); 20k rows × 100 grown
    * trees budgets ~60 MB of tree arrays + ~1 MB of feature columns —
    * driver-metadata-sized. Tunable per deploy. */
  def driverFitLimit: Long =
    sys.props.get("graft.ml.rfDriverFitLimit").map(_.toLong)
      .getOrElse(20000L)

  // ---- deterministic bootstrap -----------------------------------------

  /** splitmix64 finalizer — the standard 64-bit avalanche. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Content hash of one training row — the partition-free row identity
    * the bootstrap keys on. Byte-identical rows collide by design (they
    * are interchangeable); distinct rows collide with 2⁻⁶⁴ probability. */
  def rowHash(x: Array[Double], y: Double): Long = {
    var h = mix64(java.lang.Double.doubleToLongBits(y))
    var i = 0
    while (i < x.length) {
      h = mix64(h ^ java.lang.Double.doubleToLongBits(x(i)))
      i += 1
    }
    h
  }

  /** Poisson(1) multiplicity by inverse CDF from the (seed, tree, row)
    * hash — the standard bootstrap-approximation MLlib itself uses
    * (BaggedPoint), made layout-free. */
  def poissonWeight(seed: Long, tree: Int, rh: Long): Int = {
    val h = mix64(mix64(seed ^ (tree.toLong * 0xd1342543de82ef95L)) ^ rh)
    // 53-bit mantissa → u uniform in (0,1), never exactly 0 or 1
    val u = ((h >>> 11).toDouble + 0.5) / 9007199254740992.0
    var k = 0; var p = math.exp(-1.0); var cdf = p
    while (u > cdf && k < 16) { k += 1; p /= k; cdf += p }
    k
  }

  // ---- exact-split CART growth ------------------------------------------

  private final class Grower(xs: Array[Array[Double]], y: Array[Double],
                             w: Array[Int], maxDepth: Int,
                             imp: Array[Double]) {
    private val feature = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val threshold = scala.collection.mutable.ArrayBuffer.empty[Double]
    private val left = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val right = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val pred = scala.collection.mutable.ArrayBuffer.empty[Double]
    private val nFeat = xs.length

    private def newNode(): Int = {
      feature += -1; threshold += 0.0; left += -1; right += -1; pred += 0.0
      feature.length - 1
    }

    /** Weighted moments over a node's rows, fixed ascending-index fold. */
    private def moments(idx: Array[Int]): (Double, Double, Double) = {
      var sw = 0.0; var sy = 0.0; var syy = 0.0; var i = 0
      while (i < idx.length) {
        val r = idx(i); val wi = w(r).toDouble
        sw += wi; sy += wi * y(r); syy += wi * y(r) * y(r)
        i += 1
      }
      (sw, sy, syy)
    }

    def grow(idx: Array[Int], depth: Int): Int = {
      val node = newNode()
      val (sw, sy, syy) = moments(idx)
      val sse = syy - sy * sy / sw
      pred(node) = sy / sw
      if (depth >= maxDepth || sw < 2.0 || sse <= 1e-12) return node
      // exact split search: per feature, rows sorted by value (stable
      // row-index tiebreak), candidate boundaries between DISTINCT
      // values, midpoint threshold — sklearn's CART
      var bestGain = 1e-12; var bestF = -1; var bestThr = 0.0
      var f = 0
      while (f < nFeat) {
        val xf = xs(f)
        val sorted = idx.sortBy(r => (xf(r), r))
        var wl = 0.0; var syl = 0.0; var syyl = 0.0
        var i = 0
        while (i < sorted.length - 1) {
          val r = sorted(i); val wi = w(r).toDouble
          wl += wi; syl += wi * y(r); syyl += wi * y(r) * y(r)
          if (xf(r) != xf(sorted(i + 1)) && wl >= 1.0 && sw - wl >= 1.0) {
            val wr = sw - wl; val syr = sy - syl; val syyr = syy - syyl
            val gain = sse - (syyl - syl * syl / wl) - (syyr - syr * syr / wr)
            if (gain > bestGain) {
              bestGain = gain; bestF = f
              bestThr = (xf(r) + xf(sorted(i + 1))) / 2.0
            }
          }
          i += 1
        }
        f += 1
      }
      if (bestF < 0) return node
      val (li, ri) = idx.partition(r => xs(bestF)(r) <= bestThr)
      if (li.isEmpty || ri.isEmpty) return node // degenerate midpoint
      // importance is credited only for splits that actually materialize —
      // a degenerate-midpoint bailout above leaves the node a leaf and must
      // not inflate imp(bestF) (ADVICE r14; matches sklearn CART semantics)
      imp(bestF) += bestGain
      feature(node) = bestF; threshold(node) = bestThr
      left(node) = grow(li, depth + 1)
      right(node) = grow(ri, depth + 1)
      node
    }

    def result(): Tree = new Tree(feature.toArray, threshold.toArray,
      left.toArray, right.toArray, pred.toArray)
  }

  /** Fit on collected rows — ANY input order (canonicalized internally).
    * `rows` = (features, label). */
  def fit(rows: Array[(Array[Double], Double)], numTrees: Int,
          maxDepth: Int, seed: Long = 42L): Model = {
    require(rows.nonEmpty, "Forest.fit: empty training frame")
    val hashed = rows.map { case (x, yv) => (rowHash(x, yv), x, yv) }
      .sortBy(_._1)
    val n = hashed.length
    val nFeat = hashed(0)._2.length
    val xs = Array.tabulate(nFeat)(f => hashed.map(_._2(f)))
    val y = hashed.map(_._3)
    val fullIdx = Array.range(0, n)
    val fits: Seq[() => (Tree, Array[Double])] = (0 until numTrees).map { t =>
      () => {
        val w = Array.tabulate(n)(i => poissonWeight(seed, t, hashed(i)._1))
        val active = fullIdx.filter(i => w(i) > 0)
        val imp = new Array[Double](nFeat)
        // e^-n chance of an empty bootstrap at tiny n: fall back to the
        // unweighted frame rather than an undefined tree
        val (wEff, idxEff) =
          if (active.isEmpty) (Array.fill(n)(1), fullIdx) else (w, active)
        val g = new Grower(xs, y, wEff, maxDepth, imp)
        g.grow(idxEff, 0)
        (g.result(), imp)
      }
    }
    val grown = growInParallel(fits)
    val trees = grown.map(_._1).toArray
    // MLlib-style importances: per-tree normalized gain, averaged,
    // renormalized to sum 1
    val agg = new Array[Double](nFeat)
    grown.foreach { case (_, imp) =>
      val s = imp.sum
      if (s > 0) { var f = 0; while (f < nFeat) { agg(f) += imp(f) / s; f += 1 } }
    }
    val tot = agg.sum
    val importances =
      if (tot > 0) agg.map(_ / tot) else agg
    Model(trees, importances)
  }

  /** Own pool, sized to cores: `Models.fitPool` is 4 threads and
    * `inParallel` BLOCKS inside it — the ensemble already runs this fit
    * FROM that pool, so nesting there would serialize the trees. Tree
    * growth is pure CPU (no Spark jobs), so core-count threads are
    * right. */
  private lazy val treePool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(
        math.max(4, Runtime.getRuntime.availableProcessors() / 2),
        (r: Runnable) => {
          val t = new Thread(r, "graft-forest")
          t.setDaemon(true)
          t
        }))

  private def growInParallel[A](tasks: Seq[() => A]): Seq[A] = {
    implicit val ec: scala.concurrent.ExecutionContext = treePool
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(
        tasks.map(t => scala.concurrent.Future(t()))),
      scala.concurrent.duration.Duration.Inf)
  }

  /** Collect-gated fit from an assembled frame (FeaturesCol + label).
    * The caller checks [[driverFitLimit]] BEFORE calling. */
  def fitFrame(train: DataFrame, label: String, numTrees: Int,
               maxDepth: Int, seed: Long = 42L): Model = {
    val rows = train
      .select(org.apache.spark.sql.functions.col(Models.FeaturesCol),
        org.apache.spark.sql.functions.col(label).cast("double"))
      .collect()
      .map(r => (r.getAs[org.apache.spark.ml.linalg.Vector](0).toArray,
        r.getDouble(1)))
    fit(rows, numTrees, maxDepth, seed)
  }
}
