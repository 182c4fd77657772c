package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.operators.Relational

case class KV(k: String, v: Long, w: Double)

class RelationalSpec extends SparkSpec {

  private def fixture = df(Seq(
    KV("a", 3, 1.0), KV("a", 1, 2.0), KV("b", 2, 2.0),
    KV("b", 2, 2.0), KV("c", 5, 9.0)))

  test("dedupByKey keeps exactly one row per key, smallest tiebreak") {
    val out = Relational.dedupByKey(fixture, Seq("k"), Seq(col("v"), col("w")))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 2L), ("c", 5L)))
  }

  test("dupCount counts exact duplicate rows") {
    assert(Relational.dupCount(fixture).head().getLong(0) == 1L)
    assert(Relational.dupCount(fixture.distinct()).head().getLong(0) == 0L)
  }

  test("topKByVariance ranks columns by sample variance") {
    val d = df(Seq((1.0, 10.0, 100.0), (2.0, 10.0, 300.0), (3.0, 10.0, 200.0)))
      .toDF("x", "y", "z")
    val out = Relational.topKByVariance(d, Seq("x", "y", "z"), 2).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("z", "x"))
    assert(approx(out(0).getDouble(1), 10000.0))
    assert(approx(out(1).getDouble(1), 1.0))
  }

  test("tailN returns last n in ascending order") {
    val d = df((1 to 10).map(i => Tuple1(i.toLong))).toDF("t")
    val out = Relational.tailN(d, Seq(col("t")), 3).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(8L, 9L, 10L))
  }

  test("isMonotonic detects order violations") {
    val mono = df(Seq((1L, 10L), (2L, 20L), (3L, 20L))).toDF("o", "v")
    val broke = df(Seq((1L, 10L), (2L, 5L), (3L, 20L))).toDF("o", "v")
    assert(Relational.isMonotonic(mono, Nil, col("o"), col("v")).head().getBoolean(0))
    assert(!Relational.isMonotonic(broke, Nil, col("o"), col("v")).head().getBoolean(0))
  }

  test("selectByNamePredicate projects schema-matched columns") {
    val out = Relational.selectByNamePredicate(fixture,
      f => f.dataType.isInstanceOf[NumericType])
    assert(out.columns.toSeq == Seq("v", "w"))
  }

  test("featureColumns / targetColumns split on the ' - ' name contract") {
    val d = df(Seq((1.0, 2.0, "x"))).toDF("feat", "a - b", "name")
    assert(Relational.featureColumns(d) == Seq("feat"))
    assert(Relational.targetColumns(d) == Seq("a - b"))
  }

  test("stratifiedSample keeps per-stratum rates and drops unlisted strata") {
    val d = df((0 until 1000).map(i => (i.toLong, if (i % 2 == 0) "en" else "de")))
      .toDF("id", "lang")
    val out = Relational.stratifiedSample(d, col("lang"),
        Map("en" -> 200, "de" -> 800), pmod(col("id"), lit(1000)))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ids 0,2,..998 are en (assign = id): en kept iff id < 200 -> 100 rows
    // ids 1,3,..999 are de: kept iff id < 800 -> 400 rows
    assert(out == Map("en" -> 100L, "de" -> 400L))
    val none = Relational.stratifiedSample(d, col("lang"),
      Map("en" -> 200), pmod(col("id"), lit(1000)))
    assert(none.filter(col("lang") === "de").count() === 0L)
  }

  test("saltedAgg equals the plain groupBy on a skewed key distribution") {
    // 90% of rows share one key — the salting target
    val d = df((1 to 2000).map(i =>
      (i.toLong, if (i % 10 == 0) s"k${i % 3}" else "hot", i.toLong % 97)))
      .toDF("id", "k", "v")
    val salted = Relational.saltedAgg(d, Seq("k"), pmod(xxhash64(col("id")), lit(8)), 8,
        Seq(("n", count(lit(1)), sum(_).cast("long")),
          ("sum_v", sum(col("v")), sum(_).cast("long")),
          ("min_v", min(col("v")), min(_))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val plain = d.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), min("v").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(salted == plain && salted.contains("hot"))
  }

  test("approx_count_distinct scale path stays within 5% of the exact cardinality") {
    val d = df((1 to 30000).map(i => (i.toLong, s"k${i % 3}", (i * 7919L) % 4813L)))
      .toDF("id", "k", "u")
    val r = d.groupBy("k").agg(
        countDistinct(col("u")).as("exact"),
        approx_count_distinct(col("u"), rsd = 0.02).as("approx"))
      .collect()
    assert(r.length == 3)
    r.foreach { row =>
      val e = row.getLong(1).toDouble; val a = row.getLong(2).toDouble
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e for ${row.getString(0)}")
    }
  }

  test("LC register sketch (agg_approx_distinct) tracks the exact per-type cardinality") {
    val dir = "/root/testdata/sf0.001"
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val lc = SparkEntry.queries("agg_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("registers_filled"), r.getAs[Double]("nd_users_lc"))).toMap
    assert(lc.keySet == exact.keySet)
    lc.foreach { case (t, (filled, est)) =>
      val e = exact(t)
      assert(filled <= e, s"$t: fill $filled cannot exceed true cardinality $e")
      assert(math.abs(est - e) / e <= 0.05,
        s"$t: LC estimate $est vs exact $e exceeds 5% at K=${graft.queries.Grid.LcK}")
    }
  }

  test("approx_percentile scale path stays within 1% of the exact quartiles") {
    // skewed deterministic values — the sketch must track all three
    // quartiles closely at the query's accuracy=10000 setting
    val d = df((1 to 20000).map(i => Tuple1((i.toDouble * i) / 1000.0))).toDF("v")
    val r = d.agg(
      expr("percentile(v, array(0.25, 0.5, 0.75))").as("exact"),
      expr("approx_percentile(v, array(0.25, 0.5, 0.75), 10000)").as("approx")).head()
    val exact = r.getSeq[Double](0); val approx = r.getSeq[Double](1)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.01, s"approx $a vs exact $e")
    }
  }

  test("OOF target encoding: a fold's own rows never contribute (leakage law)") {
    // Independent recomputation of every (category, fold) cell from the
    // raw rows with fold f REMOVED ENTIRELY — the definitional leakage
    // check: if any own-fold row leaked into its encoding, the smoothed
    // mean here (prior included) would disagree.
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("feature_target_encode_oof")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.nonEmpty)
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), (col("event_id") % 5).cast("int").as("fold"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    for (((cat, f), (nFold, nOut, enc)) <- got) {
      val outRows = rows.filter(_._2 != f)
      val catOut = outRows.filter(_._1 == cat)
      val prior = outRows.map(_._3).sum / outRows.size
      val want = (catOut.map(_._3).sum + 20.0 * prior) / (catOut.size + 20.0)
      assert(nFold == rows.count(r => r._1 == cat && r._2 == f).toLong)
      assert(nOut == catOut.size.toLong)
      assert(math.abs(enc - want) <= 2e-6, s"$cat/$f: enc=$enc want=$want")
    }
  }

  test("pagerank: descending positive ranks, valid node ids, hubs outrank leaves") {
    val rows = SparkEntry.queries("graph_pagerank")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.forall(r => r > 0.0 && r < 1.0))
    assert(ranks.toSeq == ranks.toSeq.sorted.reverse, "top-k must be rank-descending")
    rows.foreach { r =>
      val id = r.getAs[String]("node")
      assert(id.startsWith("c") || id.startsWith("s"), s"bad node id $id")
    }
    // structural law: suppliers are the high-degree side of the bipartite
    // trade graph (far fewer suppliers than customers), so the TOP rank
    // must be a supplier hub
    assert(rows.head.getAs[String]("node").startsWith("s"),
      s"expected a supplier hub on top, got ${rows.head}")
  }

  test("categorical entropy: normalized to [0,1], one column replayed driver-side") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("agg_categorical_entropy")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val norm = r.getAs[Double]("entropy_norm")
      assert(norm >= -1e-9 && norm <= 1.0 + 1e-9, s"norm out of range: $r")
      assert(r.getAs[Double]("entropy_nats") >= -1e-9)
    }
    val counts = Tables.orders(spark, dir).groupBy("o_orderstatus").count()
      .collect().map(_.getLong(1).toDouble)
    val tot = counts.sum
    val h = -counts.map(_ / tot).map(p => p * math.log(p)).sum
    val got = rows.find(_.getAs[String]("column_name") == "o_orderstatus").get
    assert(got.getAs[Long]("n_categories") == counts.length)
    assert(math.abs(got.getAs[Double]("entropy_nats") - h) < 1e-5,
      s"H ${got.getAs[Double]("entropy_nats")} vs driver $h")
  }

  test("skew report: ordered quantiles, mass conservation, hot-key share re-derived") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("agg_skew_report")(spark, dir)
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(rows.keySet == Set("user_id", "event_type"))
    val total = Tables.events(spark, dir).count()
    for ((k, r) <- rows) {
      assert(r.getAs[Long]("n_rows") == total, s"$k mass conservation")
      val (p50, p90, p99) = (r.getAs[Double]("p50"), r.getAs[Double]("p90"),
        r.getAs[Double]("p99"))
      assert(p50 <= p90 && p90 <= p99 && p99 <= r.getAs[Long]("max_sz"),
        s"$k quantile order")
      assert(r.getAs[Double]("skew_ratio") >= 1.0 - 1e-9)
    }
    // event_type has 5 keys; its hot-key share re-derived directly
    assert(rows("event_type").getAs[Long]("n_keys") == 5)
    val hot = Tables.events(spark, dir).groupBy("event_type").count()
      .agg(max("count")).head().getLong(0)
    assert(math.abs(rows("event_type").getAs[Double]("top1_share") -
      math.rint(hot.toDouble / total * 1e6) / 1e6) < 1e-9)
  }

  test("point-in-time join: each fact matches at most the version valid at its time") {
    val dir = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("join_point_in_time")(spark, dir).head()
    val nFacts = r.getAs[Long]("n_facts")
    val nMatched = r.getAs[Long]("n_matched")
    assert(nFacts == Tables.events(spark, dir)
      .filter(col("event_type") === "click").count(),
      "disjoint version intervals must not duplicate facts")
    assert(nMatched <= nFacts && r.getAs[Long]("n_current") <= nMatched)
    // driver recount of matched facts: a click matches iff its user has
    // ANY purchase at or before the click time
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(expr("unix_micros(ts)")).as("first_p"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val wantMatched = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), expr("unix_micros(ts)").as("t"))
      .collect().count(x => purchases.get(x.getLong(0)).exists(_ <= x.getLong(1)))
    assert(nMatched == wantMatched, s"matched $nMatched vs driver $wantMatched")
  }

  test("rolling 7-day distinct users equals a driver-side set-union recount") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("agg_rolling_distinct_users")(spark, dir)
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("mau7"))).toMap
    val presence = Tables.events(spark, dir)
      .select(col("user_id"), Tables.epochDay(col("ts")).cast("long").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDay = presence.map(_._2).max
    val byDay = presence.groupBy(_._2).map { case (d, v) => d -> v.map(_._1).toSet }
    for ((day, (dau, mau7)) <- out) {
      val want7 = (day - 6 to day).flatMap(d => byDay.getOrElse(d, Set.empty)).toSet.size
      val want1 = byDay.getOrElse(day, Set.empty).size
      assert(dau == want1, s"day $day dau $dau vs $want1")
      assert(mau7 == want7, s"day $day mau7 $mau7 vs $want7")
      assert(mau7 >= dau, "weekly actives contain daily actives")
    }
    // every window day up to the data edge is present
    assert(out.keySet.max == maxDay)
  }

  test("rolling MAU sketch tracks the exact rolling MAU within HLL error") {
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("agg_rolling_distinct_users")(spark, dir)
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("mau7")).toMap
    val approx = SparkEntry.queries("agg_rolling_distinct_hll")(spark, dir)
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Double]("mau7_lc")).toMap
    assert(approx.keySet == exact.keySet, "same window days")
    approx.foreach { case (day, est) =>
      val e = exact(day)
      // K=65536 linear counting at n ≲ 1500: stderr √K(e^t−t−1)/n with
      // t=n/K is well under 1%; 5% is a loose regression bound
      assert(math.abs(est - e) / e <= 0.05,
        s"day $day: LC estimate $est vs exact $e exceeds 5%")
    }
  }

  test("bfs distances match a driver-side queue BFS on the same edge set") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("graph_bfs_distance")(spark, dir)
      .collect().map(r => r.getAs[Int]("dist") -> r.getAs[Long]("n_nodes")).toMap
    // driver BFS over the collected edge list (bounded: distinct pairs)
    val pairs = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("cn"),
        concat(lit("s"), col("l_suppkey")).as("sn"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val adj = (pairs.map { case (c, su) => c -> su } ++
      pairs.map { case (c, su) => su -> c })
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val src = "c" + pairs.map(_._1.drop(1).toLong).min
    var dist = Map(src -> 0)
    var frontier = Set(src)
    var hop = 0
    while (hop < 6 && frontier.nonEmpty) {
      hop += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .diff(dist.keySet)
      dist = dist ++ next.map(_ -> hop)
      frontier = next
    }
    val want = dist.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out == want, s"got $out want $want")
    // bipartite law: odd hops are suppliers-only counts' parity side —
    // the source is a customer, so hop parity alternates sides
    assert(out.keySet.min == 0 && out(0) == 1L)
  }
}
