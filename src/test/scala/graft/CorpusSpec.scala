package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

class CorpusSpec extends SparkSpec {

  private def toksDf(rows: (Long, String)*) =
    df(rows.toSeq).toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))

  test("chunkTokens: overlapping windows, short-doc single chunk, exact boundaries") {
    // 10 tokens, window 4, stride 3: ((10−4)+2) div 3 + 1 = 3 chunks at 1, 4, 7
    val d = toksDf(1L -> "a b c d e f g h i j", 2L -> "x y")
    val out = Corpus.chunkTokens(d, "doc_id", "toks", window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    val doc1 = out.filter(_._1 == 1L)
    // starts 1, 4, 7 cover tokens 1..10 exactly: (10-4+2) div 3 + 1 = 3 chunks
    // (chunk_id is LONG — SQL `div` is an integral-divide returning BIGINT,
    // and the oracle hash-matches that type)
    assert(doc1.toSeq == Seq(
      (1L, 0L, 4, "a b c d"), (1L, 1L, 4, "d e f g"), (1L, 2L, 4, "g h i j")))
    // short doc: one (short) chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 2, "x y")))
    // every token of doc 1 appears in some chunk (coverage property)
    val covered = doc1.flatMap(_._4.split(" ")).toSet
    assert(covered == "a b c d e f g h i j".split(" ").toSet)
  }

  test("decontaminate drops exactly the docs sharing an n-gram with the eval set") {
    val train = toksDf(
      1L -> "the quick brown fox jumps over",   // shares "quick brown fox" with eval
      2L -> "entirely different words here now",
      3L -> "quick brown fox somewhere else too") // shares too
    val eval_ = toksDf(100L -> "a quick brown fox appears")
    val kept = Corpus.decontaminate(train, eval_, "doc_id", "toks", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L))
  }

  test("decontaminate keeps everything when the eval set shares nothing") {
    val train = toksDf(1L -> "alpha beta gamma delta", 2L -> "epsilon zeta eta theta")
    val eval_ = toksDf(100L -> "one two three four five")
    val kept = Corpus.decontaminate(train, eval_, "doc_id", "toks", n = 3)
      .count()
    assert(kept == 2)
  }

  test("redactPii scrubs emails and phones, piiHits counts them") {
    val d = df(Seq(("reach me at bob123@mail.com or 555-1234 thanks", 1)))
      .toDF("text", "id")
    val r = d.select(Corpus.redactPii(col("text")).as("red"),
        Corpus.piiHits(col("text")).as("n"))
      .head()
    assert(r.getString(0) == "reach me at <EMAIL> or <PHONE> thanks")
    assert(r.getInt(1) == 2)
  }

  test("quotaSample returns exactly the quota per key, deterministically") {
    val rows = (1L to 40L).map(i => (i, if (i <= 20) "a" else "b"))
    val d = df(rows).toDF("id", "k")
    val out = Corpus.quotaSample(d, "k", "id", Map("a" -> 5), defaultQuota = 3)
    val byKey = out.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("a" -> 5L, "b" -> 3L))
    // deterministic: same selection on re-run
    val ids1 = out.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Corpus.quotaSample(d, "k", "id", Map("a" -> 5), defaultQuota = 3)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }

  test("binByCuts assigns 1-based bins against broadcast cut points") {
    val d = df((1 to 100).map(i => Tuple1(i.toDouble))).toDF("v")
    val cuts = Corpus.quantileCuts(d, "v", 4) // quartiles of 1..100
    assert(cuts.length == 3)
    val bins = d.withColumn("bin", Corpus.binByCuts(col("v"), cuts))
      .groupBy("bin").count().orderBy("bin").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(bins.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(bins.map(_._2).sum == 100)
    // exact percentile of 1..100 at 0.25 = 25.75 → bin1 = {1..25}
    assert(bins.head._2 == 25)
  }

  test("winsorizeByIqr clamps outliers to the fence and leaves the bulk alone") {
    // values 1..9 plus an outlier 100: q1=3, q3=7 (exact percentile of 10 values:
    // q1 = 3.25, q3 = 7.75 with interpolation) — compute fences from the op itself
    val d = df(((1 to 9).map(_.toDouble) :+ 100.0).map(v => ("g", v))).toDF("k", "v")
    val out = Corpus.winsorizeByIqr(d, "k", "v", k = 1.5)
      .select("v", "clipped").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // q1 = 3.25, q3 = 7.75, iqr = 4.5 → hi fence = 7.75 + 6.75 = 14.5
    assert(approx(out(100.0), 14.5))
    assert(approx(out(5.0), 5.0)) // interior untouched
  }

  test("packSequences: shard = block the doc's first token lands in, per group") {
    // budget 5; group g: docs of 3, 4, 2, 6 tokens ->
    //   cum-before: 0, 3, 7, 9 -> shards 0, 0, 1, 1
    val d = df(Seq(
      ("g", 1L, "a b c"), ("g", 2L, "a b c d"), ("g", 3L, "a b"),
      ("g", 4L, "a b c d e f"), ("h", 5L, "a")))
      .toDF("grp", "doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
    val out = graft.operators.Corpus
      .packSequences(d, Seq("grp"), "doc_id", "toks", budget = 5L)
      .select("doc_id", "n_tokens", "cum", "shard_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((3L, 3L, 0L)))
    assert(out(2L) == ((4L, 7L, 0L)))
    assert(out(3L) == ((2L, 9L, 1L)))
    assert(out(4L) == ((6L, 15L, 1L)))
    assert(out(5L) == ((1L, 1L, 0L))) // independent group restarts at shard 0
  }

  test("ewmaTruncated renormalizes short history and matches the closed form") {
    val d = df(Seq(("g", 1L, 10.0), ("g", 2L, 20.0), ("g", 3L, 30.0)))
      .toDF("k", "t", "v")
    val out = Corpus.ewmaTruncated(d, "k", "t", "v", alpha = 0.5, depth = 8)
      .select("t", "ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approx(out(1L), 10.0)) // single obs: renormalized to itself
    // t=2: (20 + 0.5*10) / 1.5 = 16.666...
    assert(approx(out(2L), 25.0 / 1.5))
    // t=3: (30 + 0.5*20 + 0.25*10) / 1.75 = 42.5/1.75
    assert(approx(out(3L), 42.5 / 1.75))
  }

  test("JS drift: bounded by ln 2, contributions sum to the total, driver recount") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("corpus_drift_js")(spark, dir).collect()
    assert(rows.nonEmpty)
    val js = rows.head.getAs[Double]("js_total")
    assert(js >= -1e-9 && js <= math.log(2.0) + 1e-9, s"JS out of [0, ln2]: $js")
    assert(rows.forall(r => math.abs(r.getAs[Double]("js_total") - js) < 1e-9))
    val sumC = rows.map(_.getAs[Double]("contrib")).sum
    assert(math.abs(sumC - js) < 1e-4, "contributions must sum to the total")
    // per-source halves partition the corpus
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.map(r => r.getAs[Long]("na") + r.getAs[Long]("nb")).sum == nDocs)
    // identical halves law: computing JS of a distribution against
    // itself is zero — re-derive driver-side with P = Q = overall mix
    val overall = Tables.documents(spark, dir).groupBy("source").count()
      .collect().map(_.getLong(1).toDouble)
    val tot = overall.sum
    val p = overall.map(_ / tot)
    val self = p.map(x => x * math.log(x / x) / 2 * 2).sum
    assert(math.abs(self) < 1e-12)
  }

  test("temperature mix flattens the lang distribution, shares conserve") {
    val out = SparkEntry.queries("corpus_temperature_mix")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length >= 2)
    assert(math.abs(out.map(_.getAs[Double]("natural_share")).sum - 1.0) < 1e-4)
    assert(math.abs(out.map(_.getAs[Double]("temperature_share")).sum - 1.0) < 1e-4)
    val byN = out.sortBy(_.getAs[Long]("n_docs"))
    // temperature preserves the ordering but compresses the range:
    // the smallest lang is upsampled, the largest downsampled
    assert(byN.head.getAs[Double]("upsample_factor") > 1.0)
    assert(byN.last.getAs[Double]("upsample_factor") < 1.0)
    val nat = byN.map(_.getAs[Double]("natural_share"))
    val tmp = byN.map(_.getAs[Double]("temperature_share"))
    assert(tmp.last / tmp.head < nat.last / nat.head,
      "temperature must compress the share range")
    assert(tmp.sliding(2).forall { case Array(a, b) => a <= b },
      "temperature must preserve the size ordering")
  }

  test("token budget plan: water-filling replay, conservation, caps, prefix saturation") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("corpus_token_budget_plan")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    // replay the water-filling on the driver from the raw integers
    val per = Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        (length(col("text")) -
          length(regexp_replace(col("text"), " ", "")) + 1).cast("long")
          .as("n_tok"))
      .groupBy("source")
      .agg(sum("n_tok").as("avail"),
        sum(when(col("lang") === "en", col("n_tok")).otherwise(0L)).as("en"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = 3L * per.map(_._2).sum
    // saturation order r = cap/w ascending, then the SQL's POSITIONAL
    // prefix/suffix cross-multiplication rule, mirrored exactly
    val ordered = per.filter(_._3 > 0)
      .sortBy { case (s, a, e) => (4.0 * a / e, s) }
    val caps = ordered.map(t => 4L * t._2)
    val pcs = caps.scanLeft(0L)(_ + _)
    val sws = ordered.map(_._3).scanRight(0L)(_ + _)
    val sat = ordered.zipWithIndex.map { case ((s, _, e), k) =>
      s -> ((b - pcs(k)) * e >= caps(k) * sws(k))
    }.toMap
    // water-filling correctness requires the saturated set to be a PREFIX
    val flags = ordered.map { case (s, _, _) => sat(s) }
    assert(flags.zip(flags.tail).forall { case (x, y) => x || !y },
      s"saturation must be a prefix of the r-order: ${flags.toSeq}")
    val lnum = b - ordered.zipWithIndex
      .collect { case ((s, _, _), k) if sat(s) => caps(k) }.sum
    val lden = ordered.collect { case (s, _, e) if !sat(s) => e }.sum
    out.foreach { r =>
      val s = r.getAs[String]("source")
      val a = r.getAs[Long]("avail_tokens")
      val e = r.getAs[Long]("en_tokens")
      assert(r.getAs[Boolean]("saturated") == sat.getOrElse(s, false),
        s"$s saturation drifted")
      val want =
        if (sat.getOrElse(s, false)) 4.0 * a
        else if (e == 0L || lden == 0L) 0.0
        else BigDecimal(lnum.toDouble * e / lden)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("alloc_tokens") - want) < 1e-6,
        s"$s alloc: got ${r.getAs[Double]("alloc_tokens")} want $want")
      // hard cap: nobody exceeds 4 epochs
      assert(r.getAs[Double]("epochs") <= 4.0 + 1e-9)
    }
    // conservation: allocations exhaust the budget (grid-6 rounding slack)
    val total = out.map(_.getAs[Double]("alloc_tokens")).sum
    assert(math.abs(total - b.toDouble) < 1e-3 * b,
      s"allocations must exhaust the budget: $total vs $b")
    // the plan must DISCRIMINATE: both branches populated
    assert(out.exists(_.getAs[Boolean]("saturated")),
      "no source saturates: the cap audits nothing")
    assert(out.exists(!_.getAs[Boolean]("saturated")),
      "every source saturates: the water level audits nothing")
  }
}
