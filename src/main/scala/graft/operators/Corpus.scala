package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for a large-scale training-data pipeline:
  * document chunking, eval-set decontamination, PII redaction, mixture
  * (quota) sampling, and the distribution-shaping feature ops (quantile
  * binning, winsorizing, truncated EWMA).
  *
  * All of these are pure declarative plans (no UDFs, no driver loops
  * beyond tiny cut-point collects), so Catalyst pushes filters/projections
  * through them and whole-stage codegen covers the hot paths.
  */
object Corpus {

  // ---- chunking -------------------------------------------------------

  /** Split each document's token array into overlapping windows of
    * `window` tokens advancing by `stride` (stride < window ⇒ overlap of
    * window − stride tokens — the shape LLM pre-training feeds expect).
    *
    * Chunk count is `(max(n − window, 0) + stride − 1) div stride + 1`
    * (clamped subtraction first, so integer division never sees a
    * negative operand — Spark `div` truncates toward zero while most SQL
    * engines floor, and keeping the operand non-negative makes the two
    * agree). A doc shorter than `window` yields exactly one short chunk.
    *
    * Scale: explode of a per-row `sequence` is narrow — no shuffle at
    * all; output partitioning inherits the input's. At 100 TB this is a
    * pure map stage.
    */
  def chunkTokens(df: DataFrame, idCol: String, toksCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(stride >= 1 && window >= stride,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    df.withColumn("n_chunks",
        expr(s"(greatest(size($toksCol) - $window, 0) + ${stride - 1}) div $stride + 1"))
      .withColumn("chunk_id", explode(sequence(lit(0), col("n_chunks") - 1)))
      .withColumn("chunk_toks", expr(s"slice($toksCol, chunk_id * $stride + 1, $window)"))
      .select(col(idCol), col("chunk_id"),
        size(col("chunk_toks")).as("n_chunk_tokens"),
        array_join(col("chunk_toks"), " ").as("chunk_text"))
  }

  /** Token-budget sequence packing: lay documents out in deterministic
    * `orderCol` order within each `blockCols` group and assign each to
    * the `budget`-token shard its FIRST token lands in (overflow is the
    * loader's split — standard pack-then-split bookkeeping). One
    * running-total window per block; blocks keep the windows parallel
    * (at 100 TB the block key gains a date/hash bucket — same plan).
    * Adds `n_tokens`, `cum` (inclusive running total) and `shard_id`. */
  def packSequences(df: DataFrame, blockCols: Seq[String], orderCol: String,
                    toksCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(blockCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", size(col(toksCol)).cast("long"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("shard_id",
        floor((col("cum") - col("n_tokens")) / budget).cast("long"))
  }

  // ---- decontamination --------------------------------------------------

  /** Distinct word n-gram ("shingle") strings of a token array, clamping
    * the tail indices like [[Dedup]]'s 3-shingles so a doc shorter than
    * `n` still yields one (degenerate) shingle. An EMPTY token array yields
    * an empty shingle array — under ANSI mode an unclamped `element_at`
    * would throw INVALID_ARRAY_INDEX, and tokenizers other than
    * `split(text, ' ')` can legitimately produce zero tokens. */
  def shingleStrings(toksCol: String, n: Int): Column = {
    val parts = (0 until n).map {
      case 0 => s"element_at($toksCol, i)"
      case k => s"element_at($toksCol, least(i + $k, size($toksCol)))"
    }.mkString(", ")
    expr(s"CASE WHEN size($toksCol) >= 1 THEN " +
      s"array_distinct(transform(sequence(1, greatest(size($toksCol) - ${n - 1}, 1)), " +
      s"i -> concat_ws(' ', $parts))) ELSE CAST(array() AS array<string>) END")
  }

  /** Test-set decontamination: drop every training document that shares
    * at least one distinct `n`-gram with any document of `evalSet`.
    *
    * Shape at 100 TB: the eval side is benchmarks — tiny — so its
    * exploded shingle set broadcasts; the training side streams through
    * one narrow explode + broadcast semi-join (no shuffle of the corpus).
    * We leave the broadcast decision to AQE (the eval set is small after
    * aggregation, not guaranteed so before). Joining on the shingle
    * STRING keeps the operator exact; hash to `xxhash64` 8-byte keys when
    * the shingle payload itself dominates the exchange.
    */
  def decontaminate(train: DataFrame, evalSet: DataFrame,
                    idCol: String, toksCol: String, n: Int): DataFrame = {
    val evalShingles = evalSet
      .select(explode(shingleStrings(toksCol, n)).as("sh")).distinct()
    val contaminated = train
      .select(col(idCol), explode(shingleStrings(toksCol, n)).as("sh"))
      .join(evalShingles, Seq("sh"), "left_semi")
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  // ---- PII redaction ------------------------------------------------------

  /** Conservative PII patterns (shared verbatim with the DuckDB twin —
    * both RE2 and java.util.regex read these identically). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[a-z0-9]+@[a-z]+\\.com" -> "<EMAIL>",
    "[0-9]{3}-[0-9]{4}" -> "<PHONE>")

  /** Replace every PII match with its tag. regexp_replace is global in
    * Spark (all matches), matching DuckDB's 'g' flag. Narrow, codegen'd. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, tag)) => regexp_replace(c, p, tag) }

  /** Count of PII matches (before redaction) — the audit column a
    * compliance pipeline logs alongside the scrub. Pattern passed as a
    * Column literal, not through the SQL parser (the `\.` survives). */
  def piiHits(text: Column): Column = {
    val alt = piiPatterns.map(_._1).mkString("|")
    size(regexp_extract_all(text, lit(alt), lit(0)))
  }

  // ---- mixture (quota) sampling ------------------------------------------

  /** Deterministic quota sampling toward a target source mixture: keep
    * the first `quota(key)` rows of each key in md5-of-id order (a fixed
    * pseudo-random permutation both engines reproduce bit-for-bit —
    * unlike `rand()`, which is seed- and partitioning-dependent).
    *
    * One shuffle on the mixture key. Quota keys are per-source — a
    * bounded, small domain — so the per-key sort is bounded by the
    * largest source, and a skewed source can be pre-cut with a cheap
    * hash filter before the window if it dominates.
    */
  def quotaSample(df: DataFrame, keyCol: String, idCol: String,
                  quotas: Map[String, Int], defaultQuota: Int): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val quotaCol = quotas.foldLeft(lit(defaultQuota)) { case (c, (k, q)) =>
      when(col(keyCol) === k, q).otherwise(c)
    }
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quotaCol)
      .drop("rk")
  }

  // ---- distribution shaping -------------------------------------------

  /** Exact quantile cut points of `valueCol` (driver-held: `nBins − 1`
    * doubles — metadata, like the centroids in nearest-centroid). At
    * 100 TB swap the exact `percentile` for `approx_percentile`; the
    * assignment side is unchanged. */
  def quantileCuts(df: DataFrame, valueCol: String, nBins: Int): Seq[Double] = {
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    df.agg(expr(s"percentile($valueCol, array(${ps.mkString(",")}))").as("qs"))
      .head().getSeq[Double](0)
  }

  /** Assign each row its quantile bin (1-based) from broadcast cut
    * points: `1 + Σ (value > cut_k)` — a narrow codegen'd expression, no
    * global sort (an `ntile` window would single-partition the corpus,
    * the classic scale-killer this formulation avoids). */
  def binByCuts(value: Column, cuts: Seq[Double]): Column =
    cuts.foldLeft(lit(1)) { (c, q) => c + when(value > q, 1).otherwise(0) }

  /** Winsorize (IQR-clip) `valueCol` within each group: values outside
    * `[q1 − k·IQR, q3 + k·IQR]` are clamped to the fence. Group quartiles
    * are one aggregation, broadcast back; the clip itself is narrow. */
  def winsorizeByIqr(df: DataFrame, keyCol: String, valueCol: String,
                     k: Double = 1.5): DataFrame = {
    val q = df.groupBy(keyCol).agg(
      expr(s"percentile($valueCol, 0.25)").as("q1"),
      expr(s"percentile($valueCol, 0.75)").as("q3"))
    df.join(broadcast(q), Seq(keyCol))
      .withColumn("clipped",
        greatest(col("q1") - lit(k) * (col("q3") - col("q1")),
          least(col("q3") + lit(k) * (col("q3") - col("q1")), col(valueCol))))
      .drop("q1", "q3")
  }

  /** Truncated exponentially-weighted moving average over the trailing
    * `depth` rows per key (pandas `ewm(alpha).mean()` semantics with
    * `adjust=True`, truncated at `depth` lags): weighted mean with
    * weights (1−α)^i over the lags that EXIST — shorter history near the
    * partition start renormalizes, it does not zero-fill.
    *
    * Written as `depth` explicit `lag` terms over one window — fully
    * codegen'd, one shuffle on the key (a collect_list + fold would ride
    * the interpreted HOF path). α = 0.5 by default: exactly
    * representable in binary, so both engines' weight ladders agree
    * bit-for-bit.
    */
  def ewmaTruncated(df: DataFrame, keyCol: String, orderCol: String,
                    valueCol: String, alpha: Double = 0.5,
                    depth: Int = 8): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val terms = (0 until depth).map { i =>
      val wi = math.pow(1.0 - alpha, i)
      val l = if (i == 0) col(valueCol) else lag(col(valueCol), i).over(w)
      (when(l.isNull, 0.0).otherwise(lit(wi) * l),
        when(l.isNull, 0.0).otherwise(lit(wi)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn("ewma", num / den)
  }
}
