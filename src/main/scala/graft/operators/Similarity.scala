package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / vector-similarity operators over an
  * embedding column (`array<float>`). Training-data-pipeline scope (no
  * reference analog).
  *
  * The dot product is a single codegen'd higher-order fold
  * (`aggregate(zip_with(a, b, *), 0d, +)`) — sequential double
  * accumulation, which is exactly what the DuckDB oracle's
  * `list_dot_product(::DOUBLE[])` computes, so results hash-match without
  * tolerance tricks.
  *
  * Scale design:
  *  - brute force is the *verification baseline*: queries × corpus via a
  *    broadcast of the (small) query set — never a shuffle of the corpus;
  *  - the production path is hyperplane-LSH: 8 deterministic hyperplanes →
  *    8-bit bucket key → equi-join within buckets (candidates ≈ n²/256 per
  *    band), same explode/bucket-join shape as MinHash-LSH, AQE handles
  *    skewed buckets.
  */
object Similarity {

  /** Small/compacted vector tables arrive in few partitions while the
    * per-pair dot products are the cost — fan out to full parallelism. */
  private def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Sequential-fold dot product of two double arrays — a native codegen
    * expression (graft.functions.DotProductExpr); same accumulation order
    * as the DuckDB oracle's list_dot_product. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.DotProductExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** `similarity_topk_bruteforce`: exact top-k neighbors for each query
    * vector. The query set is broadcast (small by construction); the
    * corpus streams through map-side; one shuffle for the per-query top-k
    * (row_number window partitioned by query id). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // norms precomputed per vector, not per pair: O(q+n) norm folds
    // instead of O(q·n) — at corpus scale the norms are 2/3 of the flops
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv"))))
    val c = fanOut(corpus).select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Johnson–Lindenstrauss-style random projection to `outDim`
    * dimensions using the SAME deterministic integer hyperplanes as the
    * LSH bucketer, each normalized to unit length: rⱼ = v·pⱼ/‖pⱼ‖. The
    * dimensionality-reduction pre-filter ahead of exact re-scoring —
    * at corpus scale it shrinks the vectors that have to move through
    * every downstream shuffle. A narrow codegen'd map: no shuffle, and
    * the oracle regenerates identical planes from the same formula. */
  def randomProjection(df: DataFrame, vecCol: String, dim: Int, outDim: Int,
                       prefix: String = "r"): DataFrame = {
    val planes = hyperplanes(outDim, dim)
    val projected = planes.zipWithIndex.map { case (p, j) =>
      // left-to-right sum, same order as the oracle's list_dot_product
      val pNorm = math.sqrt(p.map(w => w.toDouble * w.toDouble).sum)
      (dot(asDouble(col(vecCol)), array(p.map(w => lit(w.toDouble)): _*)) /
        lit(pNorm)).as(s"$prefix$j")
    }
    df.select(df.columns.map(col).toIndexedSeq ++ projected: _*)
  }

  /** Per-label embedding centroids (class prototypes — the building
    * block for nearest-centroid classification and IVF-style coarse
    * quantization over labeled corpora): element-wise mean per label.
    * posexplode → (label, pos) average → reassemble via
    * `array_sort(collect_list(struct(pos, m)))` — two keyed shuffles,
    * vectors never concentrate on the driver or any single task, so the
    * shape holds at any corpus size (collect_list here gathers DIM
    * values per label, bounded by the embedding dimension, not by n). */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy(labelCol, "pos").agg(avg("x").as("m"))
      .groupBy(labelCol)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("centroid"))

  /** Nearest-centroid assignment: label every vector with the closest
    * prototype (squared euclidean). `centroids` is driver-held metadata
    * (|labels| × dim — same posture as the IVF coarse quantizer): each
    * centroid becomes a literal array in ONE codegen'd argmin expression,
    * so assignment is a narrow map over the corpus — no join, no
    * shuffle. */
  def assignNearestCentroid(df: DataFrame, vecCol: String,
                            centroids: Seq[(Int, Seq[Double])],
                            outCol: String): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val v = asDouble(col(vecCol))
    val scored = centroids.map { case (label, c) =>
      val cArr = array(c.map(lit(_)): _*)
      // ||v−c||² = v·v − 2 v·c + c·c; v·v is common to all → rank by
      // c·c − 2 v·c only
      struct((lit(c.map(x => x * x).sum) - lit(2.0) * dot(v, cArr)).as("d"),
        lit(label).as("label"))
    }
    df.withColumn(outCol,
      array_min(array(scored: _*)).getField("label"))
  }

  /** Selectivity knobs must GROW with the corpus — fixed constants tuned
    * at test scale silently degrade to all-pairs (LSH) or full-scan (IVF)
    * at 100 TB. Candidate pairs per LSH bucket scale as (n/2^planes)², so
    * holding the expected bucket size at `targetBucket` keeps candidate
    * generation linear in n: planes = ceil(log2(n / targetBucket)), floored
    * at 8 (sf0.01/sf0.1 both resolve to 8). Computed in PURE INTEGER
    * arithmetic (r16): ceil(log2(x)) ≡ ceil(log2(ceil(x))) for x > 1, and
    * the smallest k with 2^k ≥ ceil(n/targetBucket) has no libm in it —
    * so the DuckDB twin computes the IDENTICAL count from count(*) with
    * integer shifts and the 10×-probe corpus can never disagree with the
    * oracle by a ulp of ln (the old double formula had a knife-edge at
    * exact powers of two). */
  def planesForCorpus(n: Long, targetBucket: Int = 64): Int = {
    val m = (n + targetBucket - 1) / targetBucket
    var k = 0
    while ((1L << k) < m) k += 1
    math.max(8, k)
  }

  /** IVF coarse-list count: the classic nlist ≈ √n balance point between
    * quantizer cost (∝ nlist) and list length (∝ n/nlist), floored at 16.
    * nprobe stays a small constant multiple — the recall knob, gated by
    * SimilaritySpec's recall@5 test, not a function of n. */
  def nlistForCorpus(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)

  def nprobeForNlist(nlist: Int): Int = math.max(4, nlist / 8)

  /** Deterministic pseudo-random hyperplanes: plane j, component i is
    * ((j*dim+i)*2654435761 mod 1e9+7) − (1e9+7)/2 — integer-exact, so the
    * SQL oracle regenerates the identical planes. */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Long]] =
    (0 until numPlanes).map { j =>
      (0 until dim).map { i =>
        ((j.toLong * dim + i) * 2654435761L) % 1000000007L - 500000003L
      }
    }

  /** LSH bucket key: bit j = [dot(v, plane_j) > 0], packed to a long. */
  def bucketKey(vecCol: Column, planes: Seq[Seq[Long]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val planeArr = array(p.map(w => lit(w.toDouble)): _*)
      when(dot(asDouble(vecCol), planeArr) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed kNN label classification: every `holdout`-th vector
    * is a query, candidates come from the SAME LSH bucket (equi-join —
    * never query×corpus), exact cosine top-k inside the bucket with a
    * deterministic (rounded-cos desc, id asc) rank, majority vote with
    * the (count desc, label asc) tiebreak. Returns the per-query
    * predictions; the query layer collapses them to a confusion
    * matrix. */
  def knnClassify(df: DataFrame, idCol: String, vecCol: String,
                  labelCol: String, planes: Seq[Seq[Long]],
                  holdout: Int = 10, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn("__bucket", bucketKey(col(vecCol), planes))
    val queries = keyed.filter(col(idCol) % holdout === 0)
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"),
        col(labelCol).as("true_label"), col("__bucket"))
    val corpus = keyed.filter(col(idCol) % holdout =!= 0)
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"),
        col(labelCol).as("cl"), col("__bucket"))
    val cand = queries.join(corpus, Seq("__bucket"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val rkw = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    val votes = cand.withColumn("rk", row_number().over(rkw))
      .filter(col("rk") <= k)
      .groupBy("qid", "true_label", "cl").agg(count(lit(1)).as("v"))
    val pw = Window.partitionBy("qid").orderBy(col("v").desc, col("cl").asc)
    votes.withColumn("p", row_number().over(pw)).filter(col("p") === 1)
      .select(col("qid"), col("true_label"), col("cl").as("pred_label"))
  }

  /** `similarity_ivf`: IVF-style ANN — a KMeans coarse quantizer (nlist
    * centroids, seeded) assigns every corpus vector to an inverted list;
    * each query probes its `nprobe` nearest centroids and searches only
    * those lists. The centroid table is driver-held metadata (nlist ≪ n,
    * broadcast into expressions); the search is an equi-join on the list
    * id — the same bucket-join shape as LSH with a learned partitioner. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nlist: Int, nprobe: Int, seed: Long = 42): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val fv = fanOut(corpus).select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("fv", array_to_vector(col("v")))
      .cache()
    // Coarse quantizer: a few iterations suffice (lists only need to be
    // roughly balanced; every extra iteration is a full distributed pass)
    // — and it trains on a BOUNDED SAMPLE (≤ 256·nlist vectors, the
    // faiss guideline): at corpus scale the quantizer must never be a
    // function of a full pass, and the sample collapses to few
    // partitions so the iterative fit isn't paying a cluster-wide task
    // wave per iteration. At test SFs 256·nlist ≥ n, so the sample is
    // the whole corpus and results are unchanged.
    val n = fv.count()
    val cap = nlist.toLong * 256L
    val trainFv = (if (cap < n) fv.sample(withReplacement = false,
        cap.toDouble / n, seed) else fv)
      .coalesce(8).cache()
    val km = try {
      new KMeans().setK(nlist).setSeed(seed).setMaxIter(8)
        .setFeaturesCol("fv").fit(trainFv)
    } finally { trainFv.unpersist(); () }
    val listed = km.transform(fv).select(col(idCol).as("neighbor_id"),
      col("v").as("cv"), col("prediction").as("list_id"))
      .withColumn("cn", norm(col("cv")))

    // per-query distances to every centroid, keep the nprobe closest:
    // ||q−c||² = q·q − 2 q·c + c·c, centroids as literal arrays
    val centers = km.clusterCenters.map(_.toArray)
    val distStructs = centers.zipWithIndex.map { case (c, j) =>
      val cArr = array(c.map(lit(_)).toIndexedSeq: _*)
      struct((dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), cArr)
        + lit(c.map(x => x * x).sum)).as("dist"), lit(j).as("list_id"))
    }
    val probed = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("probe",
        explode(slice(array_sort(array(distStructs.toIndexedSeq: _*)), 1, nprobe)))
      .select(col("query_id"), col("qv"), col("qn"), col("probe.list_id").as("list_id"))

    val scored = broadcast(probed).join(listed, "list_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    val result = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
    // The cache served its purpose (count + sample + quantizer fit);
    // unpin it so it doesn't occupy executor storage for the rest of the
    // session — the returned plan re-derives the projection in one scan.
    fv.unpersist()
    result
  }

  /** `embedding_quantize_int8`: per-vector symmetric scalar quantization
    * — the memory side of vector search at 100 TB. Each vector gets one
    * scale = max|vᵢ|/127 and int8 codes qᵢ = ⌊vᵢ/scale + ½⌋ ∈ [−127,127]:
    * 4× smaller at rest and in shuffle than float32 (8× vs the double
    * compute form), with dot products reconstructable as
    * scaleₐ·scale_b·(qₐ·q_b) — the standard pre-filter step before exact
    * re-scoring of the shortlist. A narrow, codegen'd map — no shuffle.
    *
    * Rounding goes through `floor(x + 0.5)` rather than `round` so the
    * DuckDB twin computes bit-identical codes (round() half-away vs
    * half-even differs between engines; floor does not). Zero vectors
    * quantize to zeros under scale 1. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    val mx = array_max(transform(v, x => abs(x)))
    df.select(col(idCol),
        when(mx > 0, mx / 127.0).otherwise(lit(1.0)).as("scale"),
        v.as("__v"))
      .select(col(idCol), col("scale"),
        transform(col("__v"), x => floor(x / col("scale") + 0.5).cast("int")).as("q"))
  }

  /** Product-quantization codebooks: `m` subspaces × `k` centroids each,
    * trained by deterministic driver-side Lloyd iterations on a
    * deterministic sample (first `sampleCap` vectors by id — PQ
    * codebooks are model-sized metadata, and faiss trains them on a
    * bounded sample for the same reason the IVF quantizer does).
    * Init = strided picks from the sorted sample; empty clusters keep
    * their previous centroid; no RNG anywhere. */
  def pqTrain(sample: Array[Array[Double]], m: Int, k: Int,
              iters: Int = 10): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "empty PQ training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val xs = sample.map(v => v.slice(s * sub, (s + 1) * sub))
      val kk = math.min(k, xs.length)
      var cents = Array.tabulate(kk)(i => xs(i * xs.length / kk).clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(kk)(new Array[Double](sub))
        val cnt = new Array[Long](kk)
        xs.foreach { x =>
          var best = 0; var bd = Double.MaxValue
          for (c <- 0 until kk) {
            var d = 0.0; var i = 0
            while (i < sub) { val t = x(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bd) { bd = d; best = c }
          }
          cnt(best) += 1
          var i = 0
          while (i < sub) { sums(best)(i) += x(i); i += 1 }
        }
        cents = Array.tabulate(kk)(c =>
          if (cnt(c) > 0) sums(c).map(_ / cnt(c)) else cents(c))
      }
      cents
    }
  }

  /** Encode every vector to its m-byte PQ code (argmin centroid per
    * subspace). The codebooks are broadcast model metadata; encoding is
    * a narrow typed map — no shuffle, the 8×-to-32× at-rest/shuffle
    * compression PQ exists for. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(codebooks)
    fanOut(df).select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cbs = bc.value
        val m = cbs.length
        it.map { case (id, v) =>
          val varr = v.toArray
          val sub = varr.length / m
          val codes = Array.tabulate(m) { s =>
            val cents = cbs(s)
            var best = 0; var bd = Double.MaxValue
            for (c <- cents.indices) {
              var d = 0.0; var i = 0
              while (i < sub) {
                val t = varr(s * sub + i) - cents(c)(i); d += t * t; i += 1 }
              if (d < bd) { bd = d; best = c }
            }
            best
          }
          (id, codes.toSeq)
        }
      }.toDF(idCol, "codes")
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query's m×k
    * lookup table of partial squared distances is driver-computed,
    * broadcast, and applied in a narrow `mapPartitions` that keeps a
    * per-(partition, query) top-k heap — the scan does m table lookups
    * per code instead of `dim` multiplications, and only p·q·k candidate
    * rows ever reach the final per-query selection. The queries frame
    * must be driver-sized (the brute-force baseline's same contract). */
  def pqSearchTopK(codes: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, codebooks: Array[Array[Array[Double]]],
                   k: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val qs = queries.select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .as[(Long, Seq[Double])].collect()
    val m = codebooks.length
    val luts = qs.map { case (qid, qv) =>
      val qarr = qv.toArray
      val sub = qarr.length / m
      qid -> Array.tabulate(m) { s =>
        codebooks(s).map { c =>
          var d = 0.0; var i = 0
          while (i < sub) { val t = qarr(s * sub + i) - c(i); d += t * t; i += 1 }
          d
        }
      }
    }
    val bc = spark.sparkContext.broadcast(luts)
    val partial = codes.select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Seq[Int])]
      .mapPartitions { it =>
        val qluts = bc.value
        // per-query top-k heaps over this partition's codes
        val heaps = qluts.map { case (qid, _) =>
          qid -> scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.by[(Double, Long), (Double, Long)](identity)) }
        it.foreach { case (nid, cseq) =>
          val carr = cseq.toArray
          qluts.zip(heaps).foreach { case ((qid, lut), (_, heap)) =>
            if (qid != nid) {
              var d = 0.0; var s = 0
              while (s < carr.length) { d += lut(s)(carr(s)); s += 1 }
              heap.enqueue((d, nid))
              if (heap.size > k) { heap.dequeue(); () }
            }
          }
        }
        heaps.iterator.flatMap { case (qid, heap) =>
          heap.toSeq.map { case (d, nid) => (qid, nid, d) } }
      }.toDF("query_id", "neighbor_id", "approx_dist")
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_dist").asc, col("neighbor_id").asc)
    partial.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "approx_dist")
  }

  /** `similarity_ann_lsh`: near-dup pairs by cosine ≥ threshold among
    * bucket-cohabiting vectors. One narrow map to key each vector, one
    * equi-join on the bucket key. Misses cross-bucket pairs by design —
    * that is the ANN recall trade; the bruteforce operator is the recall
    * oracle. */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      numPlanes: Int, dim: Int, threshold: Double): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val keyed = fanOut(df).select(col(idCol), asDouble(col(vecCol)).as("v"),
      bucketKey(col(vecCol), planes).as("bucket"))
      .withColumn("nrm", norm(col("v")))
    // alias self-join over ONE plan → ReuseExchange (bucket keys once)
    keyed.as("a").join(keyed.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** `similarity_ann_lsh_multiprobe`: hamming-1 multiprobe over the same
    * hyperplane signatures — the recall knob that does NOT cost more
    * planes. Plain LSH loses exactly the pairs whose signatures differ in
    * ≥ 1 plane (a near-dup pair straddling one hyperplane is the dominant
    * loss mode); probing each one-bit flip of the LEFT side's bucket
    * recovers every pair at signature hamming distance ≤ 1. Each
    * qualifying pair matches on exactly ONE probe key (the flip equal to
    * `sig_a XOR sig_b`), so no dedup pass is needed.
    *
    * Shape at 100 TB: the probe explode multiplies the left exchange by
    * (planes + 1) — `planesForCorpus` grows as log2(n), so the factor is
    * logarithmic, vs the quadratic bucket-size cost of getting the same
    * recall by REMOVING a plane (halving buckets doubles candidates per
    * bucket). The right side ships once at 1×. Same equi-join shape, AQE
    * skew-split applies to hot buckets. */
  def lshNearDupPairsMultiprobe(df: DataFrame, idCol: String, vecCol: String,
                                numPlanes: Int, dim: Int, threshold: Double): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val keyed = fanOut(df).select(col(idCol), asDouble(col(vecCol)).as("v"),
      bucketKey(col(vecCol), planes).as("bucket"))
      .withColumn("nrm", norm(col("v")))
    val flips = array((lit(0L) +: (0 until numPlanes).map(j => lit(1L << j))): _*)
    val probed = keyed.withColumn("pbucket",
      explode(transform(flips, f => col("bucket").bitwiseXOR(f))))
    probed.as("a").join(keyed.as("b"),
        col("a.pbucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
