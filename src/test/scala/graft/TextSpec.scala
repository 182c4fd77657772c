package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashImpl, Text}

case class Txt(id: Long, text: String)

class TextSpec extends SparkSpec {

  private def one(text: String) =
    df(Seq(Txt(1, text))).withColumn("toks", split(col("text"), " "))

  test("meanTokenLen and stopwordRatio") {
    val out = one("the cat sat")
      .select(Text.meanTokenLen("toks").as("mtl"), Text.stopwordRatio("toks").as("sr"))
      .head()
    assert(approx(out.getDouble(0), (3 + 3 + 3) / 3.0))
    assert(approx(out.getDouble(1), 1.0 / 3.0))
  }

  test("strHash matches the SQL-side formula") {
    // (len*2654435761 + 97*first + 31*mid + last) mod P for 'word':
    val s = "word"
    val want = (s.length * 2654435761L + 97L * s.charAt(0) +
      31L * s.charAt(s.length / 2) + s.charAt(s.length - 1)) % HashImpl.P
    assert(HashImpl.strHash(s) == want)
  }

  test("tokenHashes: one hash per token, codegen path agrees with strHash") {
    val out = one("alpha beta gamma")
      .select(Text.tokenHashes(col("text"))).head().getSeq[Long](0)
    assert(out == Seq("alpha", "beta", "gamma").map(HashImpl.strHash))
  }

  test("fingerprint is order-sensitive and deterministic") {
    def fp(t: String): Long =
      one(t).select(Text.fingerprint(Text.tokenHashes(col("text")))).head().getLong(0)
    assert(fp("alpha beta gamma") == fp("alpha beta gamma"))
    assert(fp("alpha beta gamma") != fp("gamma beta alpha"))
  }

  test("simhash of identical token multisets is identical and deterministic") {
    def sh(t: String): Long =
      one(t).select(Text.simhash(Text.tokenHashes(col("text")))).head().getLong(0)
    assert(sh("a b c d") == sh("a b c d"))
    assert(sh("a b c d e f g") == sh("a b c d e f g"))
  }

  test("minhash signature length and identical-text collision") {
    def sig(t: String): Seq[Long] =
      one(t).select(Text.minhashSignature(Text.shingleHashes(col("text")), 16))
        .head().getSeq[Long](0)
    val a = "one two three four five six seven eight nine ten"
    assert(sig(a).size == 16)
    assert(sig(a) == sig(a))
    val b = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert(sig(a) != sig(b))
  }

  test("shingleHashes clamps short texts to one shingle") {
    val out = one("ab cd").select(Text.shingleHashes(col("text"))).head().getSeq[Long](0)
    assert(out == Seq(HashImpl.strHash("ab cd cd")))
  }

  test("asciiChecksum sums code points") {
    val out = one("abc").select(Text.asciiChecksum(col("text"))).head().getLong(0)
    assert(out == 'a'.toLong + 'b' + 'c')
  }

  test("langScore counts marker tokens") {
    val out = one("the datos the shuju")
      .select(Text.langScore("toks", Text.langMarkers.toMap.apply("en")).as("en"),
        Text.langScore("toks", Text.langMarkers.toMap.apply("es")).as("es"))
      .head()
    assert(out.getInt(0) == 2 && out.getInt(1) == 1)
  }

  test("perplexity filter: rows partition the corpus, rates bounded, ppl sane") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("text_perplexity_filter")(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "per-source doc counts must partition the corpus")
    rows.foreach { r =>
      val rate = r.getAs[Double]("keep_rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("kept") <= r.getAs[Long]("n_docs"))
      // a unigram LM's per-token perplexity is bounded below by 1 and, on
      // a self-trained corpus, sits near the unigram branching factor
      val ppl = r.getAs[Double]("median_ppl")
      assert(ppl > 1.0 && ppl < 1e6, s"implausible median perplexity $ppl")
    }
    // relative threshold: at least half the corpus survives by construction
    // (every doc at or below the 1.5x-median cut is kept)
    val kept = rows.map(_.getAs[Long]("kept")).sum
    assert(kept * 2 >= nDocs, s"keep rule dropped more than half: $kept/$nDocs")
  }

  test("ml_lda_topics: 4 topics x 8 ranked terms, weights ordered, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = SparkEntry.queries("ml_lda_topics")(spark, dir).collect()
    val rows = run()
    assert(rows.length == 32, "4 topics x top-8 terms")
    rows.groupBy(_.getAs[Int]("topic")).foreach { case (t, r) =>
      val w = r.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("weight"))
      assert(w.toSeq == w.toSeq.sorted.reverse, s"topic $t weight order")
      w.foreach(x => assert(x >= 0 && x <= 1))
      assert(r.map(_.getAs[String]("term")).distinct.length == 8,
        s"topic $t terms must be distinct")
    }
    assert(rows.map(_.toString).toSeq == run().map(_.toString).toSeq,
      "seeded EM determinism")
  }

  test("LDA recovers planted disjoint-vocabulary topics") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(9)
    // two disjoint vocabularies; each doc draws from exactly one
    val va = (0 until 20).map(i => s"alpha$i")
    val vb = (0 until 20).map(i => s"beta$i")
    val docs = (0 until 60).map { id =>
      val v = if (id % 2 == 0) va else vb
      (id.toLong, Seq.fill(30)(v(rnd.nextInt(v.length))))
    }
    val vocab = (va ++ vb).toArray
    val vmap = vocab.zipWithIndex.toMap
    val vecs = docs.map { case (id, toks) =>
      val counts = toks.map(vmap).groupBy(identity)
        .map { case (i, v) => (i, v.size.toDouble) }.toSeq.sortBy(_._1)
      (id, org.apache.spark.ml.linalg.Vectors.sparse(vocab.length, counts))
    }.toDF("doc_id", "features")
    val m = new org.apache.spark.ml.clustering.LDA()
      .setK(2).setMaxIter(40).setSeed(42L).setOptimizer("em")
      .setFeaturesCol("features").fit(vecs)
    val topics = m.describeTopics(10).collect()
    // each topic's top-10 terms must be (nearly) pure one vocabulary
    topics.foreach { r =>
      val terms = r.getAs[scala.collection.Seq[Int]]("termIndices").toSeq.map(vocab)
      val aShare = terms.count(_.startsWith("alpha")).toDouble / terms.length
      assert(aShare >= 0.9 || aShare <= 0.1,
        s"topic ${r.getAs[Int]("topic")} mixes vocabularies: $terms")
    }
  }

  test("gopher rules match an independent driver recomputation from raw text") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("text_gopher_quality")(spark, dir).collect()
    val raw = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == raw.size)
    val stops = Set("the", "a", "be", "to", "of", "and", "that", "have", "with")
    var keeps = 0
    out.foreach { r =>
      val text = raw(r.getAs[Long]("doc_id"))
      val toks = text.split(" ", -1)
      val nW = toks.length.toLong
      val sumLen = toks.map(_.length.toLong).sum
      val nAlpha = toks.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
      val nSym = text.count(_ == '#').toLong +
        (text.split("\\.\\.\\.", -1).length - 1).toLong
      val nStop = toks.map(_.toLowerCase).toSet.count(stops)
      val flags = Seq(
        nW >= 50 && nW <= 100000,
        sumLen >= 3 * nW && sumLen <= 10 * nW,
        10 * nSym < nW,
        5 * nAlpha >= 4 * nW,
        nStop >= 2)
      assert(r.getAs[Long]("n_words") == nW)
      assert(r.getAs[Int]("r_word_count") == (if (flags(0)) 1 else 0))
      assert(r.getAs[Int]("r_mean_word_len") == (if (flags(1)) 1 else 0))
      assert(r.getAs[Int]("r_symbol_ratio") == (if (flags(2)) 1 else 0))
      assert(r.getAs[Int]("r_alpha_words") == (if (flags(3)) 1 else 0))
      assert(r.getAs[Int]("r_stopwords") == (if (flags(4)) 1 else 0))
      assert(r.getAs[Int]("keep") == (if (flags.forall(identity)) 1 else 0))
      keeps += r.getAs[Int]("keep")
    }
    // the battery must discriminate, not rubber-stamp or reject-all
    assert(keeps > 0 && keeps < out.length, s"vacuous filter: $keeps kept")
  }

  test("zipf fit equals a driver OLS replay over the exact vocab ranks") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("text_zipf_fit")(spark, dir).head()
    val vocab = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(explode(col("toks")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = vocab.sortBy { case (t, c) => (-c, t) }.take(1000).zipWithIndex
      .map { case ((_, c), i) =>
        (r9(math.log(i + 1.0)), r9(math.log(c.toDouble))) }
    val n = pts.length
    def bd(x: Double) = BigDecimal(x)
    val sx = pts.map(p => bd(p._1)).sum.toDouble
    val sy = pts.map(p => bd(p._2)).sum.toDouble
    val sxx = pts.map(p => bd(p._1) * bd(p._1)).sum.toDouble
    val sxy = pts.map(p => bd(p._1) * bd(p._2)).sum.toDouble
    val slope = r6((n * sxy - sx * sy) / (n * sxx - sx * sx))
    assert(out.getAs[Long]("n_vocab") == n.toLong)
    assert(out.getAs[Double]("zipf_slope") == slope,
      s"slope ${out.getAs[Double]("zipf_slope")} vs $slope")
    // the synthetic near-uniform vocabulary is NOT Zipfian, and the fit
    // must say so (a real corpus sits near -1 with high R2)
    assert(out.getAs[Double]("zipf_slope") > -0.6)
    assert(out.getAs[Double]("r2") < 0.5)
  }
}
