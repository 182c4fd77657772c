package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items sketch: at most k counters, mergeable
  * (Agarwal et al., "Mergeable Summaries", PODS 2012). The guarantee that
  * matters: ANY key with true frequency > n/(k+1) is present in the final
  * summary — no false negatives above the threshold — while the state is
  * O(k) regardless of input size or cardinality.
  *
  * Insert: known key → +1; room → new counter at 1; full → decrement all
  * (implemented as drop-zeros), the classic amortized-O(1) step. Merge:
  * add counts keywise, then subtract the (k+1)-th largest count from
  * every survivor — the mergeable-summaries reduction that preserves the
  * error bound under Spark's partial-aggregation tree.
  *
  * Counter VALUES after a distributed run depend on partition order, so
  * the sketch alone is not oracle-comparable; [[HeavyHitters.exactHeavy]]
  * composes it into a deterministic two-pass operator.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(v) => buf.updated(key, v + 1)
      case None if buf.size < k => buf.updated(key, 1L)
      case None => buf.flatMap { case (kk, v) =>
        if (v > 1) Some(kk -> (v - 1)) else None
      }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = (a.keySet ++ b.keySet).iterator
      .map(kk => kk -> (a.getOrElse(kk, 0L) + b.getOrElse(kk, 0L))).toMap
    if (m.size <= k) m
    else {
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
      m.flatMap { case (kk, v) => if (v > cut) Some(kk -> (v - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Seq[String] = r.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

object HeavyHitters {

  /** The sketch as an untyped aggregate column: ≤k candidate keys. */
  def sketchCandidates(k: Int): UserDefinedFunction =
    udaf(new MisraGries(k), Encoders.STRING)

  /** `agg_heavy_hitters`: exact φ-heavy hitters in two bounded passes —
    * the pattern that replaces "group by every key" when the key space
    * is huge and only the heavy tail matters. Pass 1: the MG sketch
    * collapses the corpus to ≤k candidates (O(k) state per task, O(k)
    * rows through the final merge). Pass 2: count ONLY candidate rows
    * (broadcast of ≤k keys; map-side combine leaves ≤k partial rows per
    * task in the shuffle) and keep keys with exact share > φ.
    *
    * Deterministic even though sketch internals are partition-order
    * dependent: with k+1 ≥ 1/φ the MG guarantee makes the candidate set
    * a SUPERSET of every φ-heavy key on every run, and the exact filter
    * prunes it to precisely {key : share > φ}. */
  def exactHeavy(df: DataFrame, keyCol: String, phi: Double, k: Int): DataFrame = {
    require(phi > 0 && phi < 1, "phi must be in (0,1)")
    require((k + 1) * phi >= 1.0,
      s"k=$k too small for phi=$phi: need k+1 >= 1/phi or heavy keys can be missed")
    val cand = df.agg(sketchCandidates(k)(col(keyCol)).as("cand"))
      .select(explode(col("cand")).as(keyCol))
    val tot = df.agg(count(lit(1)).as("n_total"))
    df.join(broadcast(cand), keyCol)
      .groupBy(keyCol).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .filter(col("n") > col("n_total") * phi)
      .select(col(keyCol), col("n"),
        round(col("n") / col("n_total"), 6).as("share"))
  }
}
