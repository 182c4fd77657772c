package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One candidate row for the bounded top-k: its ordering value and a
  * unique id that makes the order total (value DESC, id ASC). */
case class TopKEntry(v: Double, id: Long)

/** Bounded top-k as a two-phase AGGREGATE — the scale-correct form of
  * "top k per key". The window formulation (`row_number() OVER
  * (PARTITION BY key ORDER BY v DESC) <= k`) must shuffle EVERY row to
  * its key's partition and sort it there; this Aggregator rides Spark's
  * partial-aggregation machinery instead, so each map task keeps at most
  * k candidates per key and the shuffle carries only those winners —
  * at 100 TB the exchange shrinks from all rows to (map tasks × k).
  *
  * The merge is order-insensitive (union then re-trim under the total
  * order), which is what partial aggregation requires; the (v DESC,
  * id ASC) tiebreak makes the result deterministic at any parallelism.
  * k is small (top-k of interest is single digits), so the per-row
  * insert is a bounded sort of k+1 elements.
  */
class TopKByValue(k: Int) extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {
  require(k > 0, "k must be positive")

  private def precedes(a: TopKEntry, b: TopKEntry): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)

  override def zero: Seq[TopKEntry] = Nil

  override def reduce(buf: Seq[TopKEntry], in: TopKEntry): Seq[TopKEntry] =
    (buf :+ in).sortWith(precedes).take(k)

  override def merge(a: Seq[TopKEntry], b: Seq[TopKEntry]): Seq[TopKEntry] =
    (a ++ b).sortWith(precedes).take(k)

  override def finish(r: Seq[TopKEntry]): Seq[TopKEntry] = r

  override def bufferEncoder: Encoder[Seq[TopKEntry]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[TopKEntry]] = ExpressionEncoder()
}

object TopKByValue {
  /** The untyped column form — the product encoder flattens the input,
    * so the call site passes the fields positionally:
    * `agg(topK(5)(valueCol, idCol))`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByValue(k), Encoders.product[TopKEntry])
}
