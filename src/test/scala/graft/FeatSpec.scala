package graft

import org.apache.spark.sql.functions._

/** Independent driver-side cross-checks for the feature-engineering /
  * model-prep pack (`queries/Feat.scala`). The DuckDB oracle pins
  * cross-engine value equality for every query; these tests re-derive
  * the statistics from raw rows in plain Scala — a second implementation
  * of the same definition — plus structural laws (mass conservation,
  * steady-state convergence, exact-arithmetic p-values) the oracle
  * cannot express.
  */
class FeatSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("lnFactSql matches driver-side ln(x!) within 1e-12 relative for x in 0..80") {
    // lookup region, crossover at 21, and deep Stirling region
    val got = spark.sql(
      s"SELECT x, ${queries.Feat.lnFactSql("x")} AS lf FROM range(0, 81) t(x)")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var want = 0.0
    for (x <- 0 to 80) {
      if (x > 0) want += math.log(x)
      val tol = math.max(1e-12, math.abs(want) * 1e-12)
      assert(math.abs(got(x) - want) <= tol,
        s"ln($x!): got ${got(x)} want $want")
    }
  }

  test("fisher exact p-value equals an exact-rational recomputation") {
    // Exact hypergeometric arithmetic in BigDecimal from BigInt
    // factorials — no logs, no Stirling, no floats until the final
    // division. The engine's Stirling/decimal path must land within
    // the output grid (1e-6) plus the mirror-tie slack.
    val r = SparkEntry.queries("stat_fisher_exact")(spark, dir).head()
    val (a, b, c, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("c"), r.getAs[Long]("d"))
    val (r1, r2, c1) = (a + b, c + d, a + c)
    def fact(n: Long): BigInt = (BigInt(1) to BigInt(n)).product
    def choose(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else fact(n) / (fact(k) * fact(n - k))
    val n = r1 + r2
    val denom = choose(n, c1)
    def prob(x: Long): BigDecimal =
      BigDecimal(choose(r1, x) * choose(r2, c1 - x)) / BigDecimal(denom)
    val lo = math.max(0L, c1 - r2)
    val hi = math.min(r1, c1)
    val pObs = prob(a)
    // exact two-sided: include every table whose exact prob ≤ observed
    // (the 1e-9 engine slack only exists to catch FLOAT mirror ties;
    // exact arithmetic needs no slack)
    val p = (lo to hi).map(prob).filter(_ <= pObs * (1 + BigDecimal("1e-12"))).sum
    assert(math.abs(r.getAs[Double]("p_value") - p.toDouble) < 2e-6,
      s"p: got ${r.getAs[Double]("p_value")} exact ${p.toDouble}")
    assert(r.getAs[Double]("p_value") > 0 && r.getAs[Double]("p_value") <= 1.0)
  }

  test("kalman local-level: exact driver replay per series + steady-state gain") {
    val out = SparkEntry.queries("ts_kalman_level")(spark, dir)
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // steady-state gain of the local-level model: K* solves the Riccati
    // fixed point — K* = (−q + √(q² + 4q)) / 2 for r = 1
    val kStar = (-0.01 + math.sqrt(0.01 * 0.01 + 4 * 0.01)) / 2
    for ((tpe, rows) <- out) {
      val sorted = rows.sortBy(_.getAs[Long]("bucket"))
      var level = 0.0; var p = 0.0
      sorted.zipWithIndex.foreach { case (row, i) =>
        val y = row.getAs[Double]("y")
        val gain =
          if (i == 0) { level = y; p = 1.0; 1.0 }
          else {
            val pp = r9(p + 0.01)
            val kg = r9(pp / (pp + 1.0))
            level = r9(level + kg * (y - level))
            p = r9((1.0 - kg) * pp)
            kg
          }
        assert(row.getAs[Double]("level") == level,
          s"$tpe step $i level: ${row.getAs[Double]("level")} vs $level")
        assert(row.getAs[Double]("gain") == gain)
      }
      // the filter reaches its Riccati fixed point well inside the series
      assert(math.abs(sorted.last.getAs[Double]("gain") - kStar) < 1e-3,
        s"$tpe steady gain ${sorted.last.getAs[Double]("gain")} vs $kStar")
      // filtered level is a convex combination of observations: bounded
      val ys = sorted.map(_.getAs[Double]("y"))
      val lv = sorted.map(_.getAs[Double]("level"))
      assert(lv.max <= ys.max + 1e-9 && lv.min >= ys.min - 1e-9)
    }
  }

  test("woe encoding: cell identities, sign law, and one band re-derived") {
    val rows = SparkEntry.queries("feature_woe_encode")(spark, dir).collect()
    assert(rows.length == 10)
    val tp = rows.map(_.getAs[Long]("n_pos")).sum.toDouble
    val tn = rows.map(_.getAs[Long]("n_neg")).sum.toDouble
    for (r <- rows) {
      assert(r.getAs[Long]("n") == r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg"))
      val woe = math.log(((r.getAs[Long]("n_pos") + 0.5) / tp) /
        ((r.getAs[Long]("n_neg") + 0.5) / tn))
      assert(approx(r.getAs[Double]("woe"), math.rint(woe * 1e6) / 1e6, 1e-6))
      // sign law on the SAME smoothed shares the WoE divides: a band
      // over-representing (smoothed) positives has positive WoE
      val liftPos = (r.getAs[Long]("n_pos") + 0.5) / tp > (r.getAs[Long]("n_neg") + 0.5) / tn
      if (math.abs(r.getAs[Double]("woe")) > 1e-4)
        assert((r.getAs[Double]("woe") > 0) == liftPos)
    }
  }

  test("hashing trick: mass conservation, bucket range, determinism") {
    val q = SparkEntry.queries("feature_hashing_trick")(spark, dir)
    val rows = q.collect()
    val total = Tables.events(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    assert(rows.forall(r => r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < 32))
    // every distinct (event_type, k) feature lands in exactly one bucket
    val nFeat = Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_features")).sum == nFeat)
    // |signed| ≤ rows per bucket (sign cancellation can only shrink)
    assert(rows.forall(r =>
      math.abs(r.getAs[Long]("signed_count")) <= r.getAs[Long]("n_rows")))
    val again = SparkEntry.queries("feature_hashing_trick")(spark, dir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("schema drift: halves partition the fact and deltas re-derive") {
    val rows = SparkEntry.queries("dq_schema_drift")(spark, dir)
      .collect().map(r => r.getAs[String]("metric") -> r).toMap
    val total = Tables.events(spark, dir).count()
    val nb = rows("n_rows").getAs[Double]("before")
    val na = rows("n_rows").getAs[Double]("after")
    assert((nb + na).toLong == total)
    assert(nb > 0 && na > 0)
    for ((_, r) <- rows) {
      val want = (r.getAs[Double]("after") - r.getAs[Double]("before")) /
        r.getAs[Double]("before")
      assert(approx(r.getAs[Double]("rel_delta"), math.rint(want * 1e6) / 1e6, 1e-6))
    }
  }

  test("degree distribution: handshake identity against the edge count") {
    val rows = SparkEntry.queries("graph_degree_distribution")(spark, dir).collect()
    // rebuild the support-≥2 co-purchase edge set on the driver
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = b.groupBy(_._1).values
    val pairCnt = new scala.collection.mutable.HashMap[(Long, Long), Int]()
    for (grp <- byOrder; x <- grp; y <- grp if x._2 < y._2)
      pairCnt((x._2, y._2)) = pairCnt.getOrElse((x._2, y._2), 0) + 1
    val edges = pairCnt.filter(_._2 >= 2).keys.toSeq
    val sumDeg = rows.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes")).sum
    assert(sumDeg == 2L * edges.length,
      s"handshake: sum(deg*n)=$sumDeg vs 2|E|=${2 * edges.length}")
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
  }

  test("common neighbors: top pair re-derived, no candidate is an edge") {
    val rows = SparkEntry.queries("graph_common_neighbors")(spark, dir).collect()
    assert(rows.nonEmpty)
    // driver rebuild of adjacency
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCnt = new scala.collection.mutable.HashMap[(Long, Long), Int]()
    for (grp <- b.groupBy(_._1).values; x <- grp; y <- grp if x._2 < y._2)
      pairCnt((x._2, y._2)) = pairCnt.getOrElse((x._2, y._2), 0) + 1
    val edges = pairCnt.filter(_._2 >= 2).keys.toSet
    val adj = new scala.collection.mutable.HashMap[Long, Set[Long]]().withDefaultValue(Set())
    for ((u, v) <- edges) { adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    for (r <- rows) {
      val (u, v) = (r.getAs[Long]("u"), r.getAs[Long]("v"))
      assert(!edges.contains((u, v)) && !edges.contains((v, u)))
      val cn = (adj(u) intersect adj(v)).size
      assert(r.getAs[Long]("common") == cn, s"($u,$v): ${r.getAs[Long]("common")} vs $cn")
      assert(r.getAs[Long]("deg_u") == adj(u).size)
      val jac = cn.toDouble / (adj(u).size + adj(v).size - cn)
      assert(approx(r.getAs[Double]("jaccard"), math.rint(jac * 1e6) / 1e6, 1e-6))
    }
  }
}
