package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

case class Vec(vec_id: Long, embedding: Seq[Float])

class SimilaritySpec extends SparkSpec {

  private def fixture = df(Seq(
    Vec(0, Seq(1f, 0f, 0f, 0f)),
    Vec(1, Seq(1f, 0.01f, 0f, 0f)), // near-dup of 0
    Vec(2, Seq(0f, 1f, 0f, 0f)),    // orthogonal to 0
    Vec(3, Seq(-1f, 0f, 0f, 0f)),   // opposite of 0
    Vec(4, Seq(0.5f, 0.5f, 0.5f, 0.5f))))

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val d = fixture.alias("a").crossJoin(fixture.alias("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Similarity.cosine(col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(approx(d((0L, 0L)), 1.0))
    assert(approx(d((0L, 2L)), 0.0))
    assert(approx(d((0L, 3L)), -1.0))
    assert(d((0L, 1L)) > 0.99)
  }

  test("bruteForceTopK: exact ranks, self excluded") {
    val out = Similarity.bruteForceTopK(fixture, fixture.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 4L, 2L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    assert(!out.exists(_.getAs[Long]("neighbor_id") == 0L))
  }

  test("selectivity knobs grow with the corpus, pinned to test-scale constants") {
    // sf0.01 (500 vecs) and sf0.1 (5000) must resolve to the 8 planes the
    // static SQL oracle unrolls; beyond test scale, planes grow as log2(n)
    // so LSH bucket size stays ~targetBucket and candidates stay linear
    assert(Similarity.planesForCorpus(500) == 8)
    assert(Similarity.planesForCorpus(5000) == 8)
    assert(Similarity.planesForCorpus(2000000000L) >= 24)
    assert(Similarity.nlistForCorpus(500) >= 16)
    assert(Similarity.nlistForCorpus(4000000L) >= 2000)
    assert(Similarity.nprobeForNlist(Similarity.nlistForCorpus(500)) >= 4)
  }

  test("hyperplanes are deterministic and reproducible") {
    val p1 = Similarity.hyperplanes(8, 64)
    val p2 = Similarity.hyperplanes(8, 64)
    assert(p1 == p2)
    assert(p1.size == 8 && p1.head.size == 64)
  }

  test("quantizeInt8: codes in [-127,127], extremes hit ±127, dequantized cosine ≈ exact") {
    val corpus = df((0 until 30).map(i =>
      Vec(i.toLong, Seq.tabulate(16)(j => math.sin(i * 3.7 + j * 1.3).toFloat * (j + 1)))))
    val q = Similarity.quantizeInt8(corpus, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2))).toSeq
    assert(q.size == 30)
    q.foreach { case (_, scale, codes) =>
      assert(scale > 0)
      assert(codes.forall(c => c >= -127 && c <= 127))
      // the max-|v| component quantizes to exactly ±127 by construction
      assert(codes.exists(c => math.abs(c) == 127))
    }
    // reconstruction: cos(dequantized, original) stays near 1 — the
    // shortlist-prefilter quality the 4x memory cut buys
    val orig = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    q.foreach { case (id, scale, codes) =>
      val deq = codes.map(_ * scale)
      val v = orig(id)
      val cos = v.zip(deq).map { case (a, b) => a * b }.sum /
        (math.sqrt(v.map(x => x * x).sum) * math.sqrt(deq.map(x => x * x).sum))
      assert(cos > 0.9999, s"vec $id dequantized cosine $cos")
    }
  }

  test("ivfTopK: probing all lists equals brute force exactly") {
    val corpus = df((0 until 40).map(i =>
      Vec(i.toLong, Seq.tabulate(8)(j => ((i * 7 + j * 13) % 19 - 9).toFloat))))
    val queries = corpus.filter(col("vec_id") % 10 === 0)
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // nprobe == nlist -> exhaustive -> must match brute force
    val ivf = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
        k = 3, nlist = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == bf)
  }

  test("ivfTopK: partial probe (nprobe=4/nlist=16) keeps recall@5 >= 0.9 vs brute force") {
    // the ANN operating point, not the exhaustive limit: 16 well-separated
    // direction clusters in 8-d (deterministic seed), 12 points each; every
    // true neighbor lives in the query's cluster, so probing the 4 nearest
    // lists must recover nearly all of the exact top-5
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Array.fill(8)(rnd.nextGaussian()))
      .map { c => val n = math.sqrt(c.map(x => x * x).sum); c.map(x => 10.0 * x / n) }
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      p <- 0 until 12
    } yield Vec((ci * 12 + p).toLong, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq)
    val corpus = df(rows)
    val queries = corpus.filter(col("vec_id") % 12 === 0) // one per cluster
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5))
    val ivf = pairs(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4))
    val recall = (ivf intersect bf).size.toDouble / bf.size
    assert(recall >= 0.9, s"recall@5 = $recall (${(ivf intersect bf).size}/${bf.size})")
  }

  test("randomProjection: one-hot rows read the unit-normalized plane weights; linear") {
    val planes = Similarity.hyperplanes(2, 4)
    val norms = planes.map(p => math.sqrt(p.map(w => w.toDouble * w.toDouble).sum))
    val d = df(Seq(
      Vec(0, Seq(1f, 0f, 0f, 0f)),
      Vec(1, Seq(2f, 0f, 0f, 0f)),
      Vec(2, Seq(0f, 0f, 1f, 0f))))
    val out = Similarity.randomProjection(d, "embedding", dim = 4, outDim = 2)
      .select("vec_id", "r0", "r1")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(approx(out(0L)._1, planes(0)(0) / norms(0)))
    assert(approx(out(0L)._2, planes(1)(0) / norms(1)))
    assert(approx(out(2L)._1, planes(0)(2) / norms(0)))
    // linearity: proj(2v) = 2 proj(v)
    assert(approx(out(1L)._1, 2 * out(0L)._1))
    assert(approx(out(1L)._2, 2 * out(0L)._2))
  }

  test("lshNearDupPairsMultiprobe: exactly the hamming<=1 pairs, strict superset of plain LSH") {
    val corpus = df((0 until 30).map(i =>
      Vec(i.toLong, Seq.tabulate(8)(j => math.sin(i * 2.3 + j * 1.7).toFloat))))
    val planes = Similarity.hyperplanes(8, 8)
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def dotp(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def sig(v: Seq[Double]): Long = planes.zipWithIndex.map { case (p, j) =>
      if (dotp(v, p.map(_.toDouble)) > 0) 1L << j else 0L }.sum
    def cos(a: Seq[Double], b: Seq[Double]) =
      dotp(a, b) / (math.sqrt(dotp(a, a)) * math.sqrt(dotp(b, b)))
    val expected = (for {
      a <- vecs.keys; b <- vecs.keys
      if a < b
      if java.lang.Long.bitCount(sig(vecs(a)) ^ sig(vecs(b))) <= 1
      if cos(vecs(a), vecs(b)) >= 0.3
    } yield (a, b)).toSet
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs(Similarity.lshNearDupPairsMultiprobe(
      corpus, "vec_id", "embedding", numPlanes = 8, dim = 8, threshold = 0.3))
    assert(got == expected, s"multiprobe != hamming<=1 reference: ${got.diff(expected)} / ${expected.diff(got)}")
    val plain = pairs(Similarity.lshNearDupPairs(
      corpus, "vec_id", "embedding", numPlanes = 8, dim = 8, threshold = 0.3))
    assert(plain.subsetOf(got))
    // the point of multiprobe: pairs straddling exactly one hyperplane
    // are recovered — the fixture must exhibit at least one
    assert((got -- plain).nonEmpty, "fixture has no hamming-1 pair above threshold — adjust it")
  }

  test("lshNearDupPairs: parallel vectors share every bucket; found at threshold") {
    val out = Similarity.lshNearDupPairs(fixture, "vec_id", "embedding",
      numPlanes = 8, dim = 4, threshold = 0.9)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((0L, 1L))) // same direction -> same signs -> same bucket
    assert(!pairs.contains((0L, 3L))) // opposite direction fails threshold anyway
  }

  test("pq: on a distinct-subvector corpus ADC is exact and matches euclidean ranks") {
    // 12 deterministic 8-dim vectors; k=16 >= 12 so Lloyd converges to
    // zero distortion (every subvector its own centroid) and the ADC
    // distance equals the exact squared euclidean distance
    val vecs = (0 until 12).map(i =>
      Vec(i.toLong, (0 until 8).map(j => ((i * 31 + j * 7) % 13 - 6).toFloat)))
    val frame = df(vecs)
    val sample = vecs.map(_.embedding.map(_.toDouble).toArray).toArray
    val cbs = Similarity.pqTrain(sample, m = 4, k = 16)
    val codes = Similarity.pqEncode(frame, "vec_id", "embedding", cbs)
    val got = Similarity.pqSearchTopK(codes, frame.filter(col("vec_id") === 0),
        "vec_id", "embedding", cbs, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("approx_dist")))
    def d2(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val want = vecs.drop(1)
      .map(v => (v.vec_id, d2(vecs.head.embedding, v.embedding)))
      .sortBy { case (id, d) => (d, id) }.take(3)
    assert(got.map(_._1).toSeq == want.map(_._1))
    got.zip(want).foreach { case ((_, ad), (_, td)) =>
      assert(math.abs(ad - td) < 1e-9, s"ADC $ad vs exact $td") }
  }

  test("pq: recall@5 against exact euclidean ranking on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("similarity_pq")(spark, dir).collect()
    assert(rows.nonEmpty)
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    val recalls = byQuery.map { case (qid, rs) =>
      val got = rs.map(_.getAs[Long]("neighbor_id")).toSet
      val truth = all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, d2(all(qid), v)) }
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean PQ recall@5 $mean below the 8x16 codebook floor")
  }

  test("ivf incremental: admission conserves the corpus and assigns argmin lists") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("similarity_ivf_incremental")(spark, dir)
      .collect()
    assert(rows.length == 16, "one audit row per posting list")
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def isNew(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 10 == 0
    }
    val (newIds, resIds) = all.map(_._1).partition(isNew)
    // conservation: every corpus vector lands in exactly one list,
    // split exactly along the house md5 admission boundary
    assert(rows.map(_.getAs[Long]("n_old")).sum == resIds.length.toLong)
    assert(rows.map(_.getAs[Long]("n_added")).sum == newIds.length.toLong)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_total") ==
        r.getAs[Long]("n_old") + r.getAs[Long]("n_added"))
      // the flag is the integer 1.25x-imbalance trigger, and NULL mean
      // distance appears exactly on zero-admission lists
      assert(r.getAs[Boolean]("needs_split") ==
        (4 * r.getAs[Long]("n_total") * 16 > 5 * all.length))
      assert(r.isNullAt(r.fieldIndex("mean_add_dist")) ==
        (r.getAs[Long]("n_added") == 0L))
    }
    // brute-force the admission itself: per-list added counts must match
    // nearest-existing-centroid assignment of exactly the new batch
    val centroids = resIds.sorted.take(16).zipWithIndex
      .map { case (id, c) => c -> all.toMap.apply(id) }
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expectAdds = newIds
      .map(id => centroids.minBy { case (c, ce) => (d2(all.toMap.apply(id), ce), c) }._1)
      .groupBy(identity).map { case (c, v) => c.toLong -> v.length.toLong }
    val gotAdds = rows.map(r =>
      r.getAs[Int]("list_id").toLong -> r.getAs[Long]("n_added"))
      .filter(_._2 > 0L).toMap
    assert(gotAdds == expectAdds,
      s"admission assignment drifted: got $gotAdds want $expectAdds")
  }

  test("pq drift: per-slice QE means brute-force-match and the flag is the 1.25x point") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("similarity_pq_drift")(spark, dir).collect()
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    val nLabels = all.map(_._3).distinct.length
    assert(rows.length == 8 * nLabels, "one row per (subspace, label cohort)")
    // the serving codebook = first 16 vectors by vec_id (the pqAdcSql sample)
    val cb = all.sortBy(_._1).take(16).map(_._2)
    def qe(v: Array[Double], sv: Int): Double =
      cb.map { ce =>
        (0 until 8).map { j =>
          val d = v(sv * 8 + j) - ce(sv * 8 + j); d * d
        }.sum
      }.min
    // brute-force the per-slice mean over grid-9 rounded QEs (the query's sum path)
    def g9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def g6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val sv = r.getAs[Int]("subspace"); val lab = r.getAs[Int]("label")
      val cohort = all.filter(_._3 == lab)
      assert(r.getAs[Long]("n_slice") == cohort.length.toLong)
      val want = g6(cohort.map(t => g9(qe(t._2, sv))).sum / cohort.length)
      val got = r.getAs[Double]("mean_qe_slice")
      assert(math.abs(got - want) < 2e-6, s"slice ($sv,$lab): $got vs $want")
      // the flag is the integer-scaled 1.25x comparison on the emitted grid-6 pair
      assert(r.getAs[Boolean]("drift_flag") ==
        (4 * got > 5 * r.getAs[Double]("mean_qe_all")))
    }
    // global mean per subspace must be the cohort-weighted mean of the slices
    rows.groupBy(_.getAs[Int]("subspace")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Double]("mean_qe_all")).distinct.length == 1)
    }
  }

  test("recall curve: probe depths brute-force-match, recall monotone, nprobe=16 is exact") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("similarity_recall_curve")(spark, dir)
      .collect().sortBy(_.getAs[Int]("nprobe"))
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 4, 8, 16))
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val byId = all.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val centroids = all.map(_._1).sorted.take(16).zipWithIndex
      .map { case (id, c) => c -> byId(id) }
    def nearestLists(v: Array[Double]): Seq[Int] =
      centroids.sortBy { case (c, ce) => (d2(v, ce), c) }.map(_._1).toSeq
    val assignOf = all.map { case (id, v) => id -> nearestLists(v).head }.toMap
    val queries = all.map(_._1).filter(_ % 50 == 0)
    // brute-force each truth pair's probe depth, then re-derive the sweep
    val depths = queries.flatMap { qid =>
      val probeOrder = nearestLists(byId(qid)).zipWithIndex
        .map { case (c, i) => c -> (i + 1) }.toMap
      val truth = all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(byId(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
      truth.map(nid => probeOrder(assignOf(nid)))
    }
    val listSizes = assignOf.values.groupBy(identity).map { case (c, v) => c -> v.size }
    rows.foreach { r =>
      val p = r.getAs[Int]("nprobe")
      assert(r.getAs[Long]("n_truth") == depths.length.toLong)
      assert(r.getAs[Long]("n_hit") == depths.count(_ <= p).toLong,
        s"nprobe=$p hits: got ${r.getAs[Long]("n_hit")} want ${depths.count(_ <= p)}")
      val wantScan = queries.map { qid =>
        nearestLists(byId(qid)).take(p).map(listSizes.getOrElse(_, 0)).sum
      }.sum
      assert(r.getAs[Long]("cand_rows") == wantScan.toLong,
        s"nprobe=$p scan cost: got ${r.getAs[Long]("cand_rows")} want $wantScan")
    }
    // operating-point laws: recall monotone in nprobe, exact at full probe
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    assert(recalls.last == 1.0, "probing all 16 lists must be exact")
  }

  test("truncation recall: prefix-d rankings brute-force-match, d=64 anchors 1.0") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("embedding_truncation_recall")(spark, dir)
      .collect().sortBy(_.getAs[Int]("dims"))
    assert(rows.map(_.getAs[Int]("dims")).toSeq == Seq(8, 16, 32, 64))
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val byId = all.toMap
    def cosD(a: Array[Double], b: Array[Double], d: Int) = {
      val dot = (0 until d).map(j => a(j) * b(j)).sum
      dot / (math.sqrt((0 until d).map(j => a(j) * a(j)).sum) *
        math.sqrt((0 until d).map(j => b(j) * b(j)).sum))
    }
    val queries = all.map(_._1).filter(_ % 50 == 0)
    def topK(qid: Long, d: Int): Set[Long] =
      all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cosD(byId(qid), v, d)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    rows.foreach { r =>
      val d = r.getAs[Int]("dims")
      val wantHits = queries.map(q => (topK(q, 64) intersect topK(q, d)).size).sum
      assert(r.getAs[Long]("n_hit") == wantHits.toLong,
        s"d=$d: got ${r.getAs[Long]("n_hit")} want $wantHits")
      assert(r.getAs[Long]("n_truth") == queries.length * 10L)
    }
    assert(rows.last.getAs[Double]("recall") == 1.0,
      "full-dim prefix IS the ground truth")
  }

  test("nsw beam: brute-force replay of graph build + 4-hop beam; recall flag exact") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("similarity_nsw_beam")(spark, dir)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("in_exact_top10")))
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val byId = all.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val centroids = all.map(_._1).sorted.take(16).zipWithIndex
      .map { case (id, c) => c -> byId(id) }
    // 2-nearest-list assignment -> overlapping blocks -> per-src top-6
    val assign2 = all.map { case (id, v) =>
      id -> centroids.sortBy { case (c, ce) => (d2(v, ce), c) }
        .take(2).map(_._1).toSet
    }.toMap
    val graph = all.map(_._1).map { src =>
      val mates = all.map(_._1).filter(o =>
        o != src && (assign2(src) intersect assign2(o)).nonEmpty)
      src -> mates.map(o => (o, cos(byId(src), byId(o))))
        .sortBy { case (o, c) => (-c, o) }.take(6).map(_._1).toSet
    }.toMap
    val entry = all.map(_._1).min
    val queries = all.map(_._1).filter(_ % 50 == 0)
    def beamSearch(qid: Long): Seq[Long] = {
      var beam = Set(entry)
      for (_ <- 1 to 4) {
        val cand = beam ++ beam.flatMap(graph)
        beam = cand.toSeq.map(n => (n, cos(byId(qid), byId(n))))
          .sortBy { case (n, c) => (-c, n) }.take(8).map(_._1).toSet
      }
      beam.toSeq.filter(_ != qid).map(n => (n, cos(byId(qid), byId(n))))
        .sortBy { case (n, c) => (-c, n) }.take(5).map(_._1)
    }
    def exactTop10(qid: Long): Set[Long] =
      all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(byId(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    queries.foreach { q =>
      val want = beamSearch(q)
      val got = rows.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      assert(got == want, s"query $q beam: got $got want $want")
      val flags = rows.filter(_._1 == q).sortBy(_._2).map(_._4).toSeq
      val wantFlags = want.map(n => if (exactTop10(q)(n)) 1L else 0L)
      assert(flags == wantFlags, s"query $q recall flags: $flags vs $wantFlags")
    }
    // the audit discriminates: across all queries both flag values occur
    val allFlags = rows.map(_._4).toSet
    assert(allFlags == Set(0L, 1L),
      s"in_exact_top10 must discriminate at this SF: $allFlags")
  }

  test("pq retrain: Lloyd half-step never raises QE; unflagged rows unchanged") {
    // sf0.01, not sf0.001: the drift trigger discriminates at the gate SF
    // (1 of 8 subspaces flagged); the smaller corpus never trips it
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("similarity_pq_retrain")(spark, dir)
      .collect().map(r => (r.getAs[Int]("subspace"), r.getAs[Long]("retrained"),
        r.getAs[Double]("qe_before"), r.getAs[Double]("qe_after")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 until 8).toSeq, "one row per subspace")
    rows.foreach { case (sv, flag, before, after) =>
      if (flag == 0L)
        assert(after == before, s"sv=$sv unflagged must keep QE: $after vs $before")
      else
        // fixed assignments + mean codewords minimize squared distance;
        // the only slack is the grid-6 codeword rounding
        assert(after <= before + 1e-5,
          s"sv=$sv Lloyd half-step raised QE: $before -> $after")
    }
    assert(rows.exists(_._2 == 1L) && rows.exists(_._2 == 0L),
      s"retrain flag must discriminate at this SF: ${rows.map(_._2).toSeq}")
  }

  test("ml_kmeans query: seeded determinism, size conservation, purity bounds") {
    val dir = "/root/testdata/sf0.001"
    def run() = SparkEntry.queries("ml_kmeans")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = run()
    assert(a == run(), "seeded KMeans must reproduce bit-identically")
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(a.map(_._2).sum == n, "cluster sizes must conserve the corpus")
    a.foreach { case (c, sz, p) =>
      assert(sz > 0 && p > 0.0 && p <= 1.0, s"cluster $c: size=$sz purity=$p") }
  }

  test("knnClassify recovers labels on a cone-clustered synthetic corpus") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(5)
    val dim = 64
    // three well-separated label cones: base direction per label plus
    // small noise — cosine neighbors share the label by construction
    val base = Array.tabulate(3, dim)((l, i) => if (i % 3 == l) 1.0 else 0.05)
    val rows = (0 until 120).map { id =>
      val l = id % 3
      val v = Array.tabulate(dim)(i =>
        (base(l)(i) + rnd.nextGaussian() * 0.02).toFloat)
      (id.toLong, v.toSeq, l)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(df, "vec_id", "embedding", "label",
        Similarity.hyperplanes(8, dim))
      .collect()
    assert(out.length == 12, "every 10th vector classified")
    out.foreach(r => assert(r.getAs[Int]("pred_label") == r.getAs[Int]("true_label"),
      s"misclassified: $r"))
  }

  test("ml_knn_classify: one confusion cell per classified query, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("ml_knn_classify")(spark, dir).collect()
    assert(rows.nonEmpty)
    val e = graft.Tables.embeddings(spark, dir)
    val nQueries = e.filter(org.apache.spark.sql.functions.expr("vec_id % 10 = 0")).count()
    val classified = rows.map(_.getAs[Long]("n")).sum
    // every classified query contributes exactly one confusion cell;
    // bucket-empty queries may drop, never duplicate (the real
    // harness embeddings have label-agnostic angular structure, so
    // accuracy here is a data property, not an operator law — the
    // synthetic cone test above pins the accuracy behavior)
    assert(classified <= nQueries && classified > 0)
    val again = SparkEntry.queries("ml_knn_classify")(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("ml_calibration_bins: reliability-table laws on the quality classifier") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("ml_calibration_bins")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val n = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == n, "bins must partition the corpus")
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val (p, f) = (r.getAs[Double]("mean_p"), r.getAs[Double]("frac_pos"))
      assert(p >= bin / 10.0 - 1e-6 && p <= (bin + 1) / 10.0 + 1e-6,
        s"mean_p $p outside bin $bin")
      assert(f >= 0.0 && f <= 1.0)
      // each ECE term is the bin's |gap| weighted by its mass
      val want = math.abs(p - f) * (r.getAs[Long]("n").toDouble / n)
      assert(math.abs(r.getAs[Double]("ece_term") - want) < 1e-4,
        s"bin $bin: ece ${r.getAs[Double]("ece_term")} vs $want")
    }
    // a sane classifier is roughly monotone: positives concentrate in
    // high-score bins — top bin rate must exceed bottom bin rate
    val byBin = rows.map(r => r.getAs[Int]("bin") -> r.getAs[Double]("frac_pos")).toMap
    assert(byBin(byBin.keys.max) > byBin(byBin.keys.min),
      "high-score bin must have more positives than low-score bin")
  }
}
