package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve: interleave the bits of two bucketed dimensions
  * so rows close in BOTH dimensions get nearby z-values. Sorting a table
  * by z before writing gives every output file a compact z-range — hence
  * a compact rectangle in (x, y) space — so per-file min/max column
  * statistics (the manifest every lake table format keeps) prune
  * MULTI-dimensional predicates, where a single-column sort prunes only
  * its own leading dimension. This is the multi-dimensional clustering
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`, reduced to its Spark-native
  * essentials: quantize → interleave → `repartitionByRange` + sort.
  *
  * Everything here composes codegen'd integer built-ins
  * (`shiftleft`/`&`/`|`/`floor`) — no UDF, no custom Expression — and the
  * identical mask-and-shift ladder is replayed verbatim by the DuckDB
  * oracle (`queries.Rel` unrolls it in SQL), so z-values hash-match
  * cross-engine.
  */
object ZOrder {

  /** Bits per dimension; 2·16 = 32 z-bits fit comfortably in a long. */
  val BITS = 16
  val MAX: Long = (1L << BITS) - 1 // 65535

  /** Spread the low 16 bits of `c` to the even positions (bit i → bit 2i):
    * the classic mask-and-shift doubling ladder, O(log bits) codegen'd
    * integer ops per row. */
  def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit bucket ids: x on even bits, y on odd. */
  def zValue2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Linear quantization of `v` onto [0, 2^BITS): subtract in the SOURCE
    * type (exact for longs — casting v to double first would round before
    * the subtraction and diverge from an engine that subtracts in int64),
    * then scale in double. Clamped on both ends so the v = hi boundary is
    * safe under FP rounding; the oracle clamps identically. Degenerate
    * lo = hi collapses to bucket 0 on both engines (NaN fails the
    * greatest(0, ·) comparison in Spark and DuckDB alike — but guard
    * explicitly rather than lean on NaN semantics). */
  def quantize(v: Column, lo: Column, hi: Column): Column =
    when(hi <= lo, lit(0L)).otherwise(
      least(lit(MAX), greatest(lit(0L),
        floor((v - lo).cast("double") * lit(MAX.toDouble) / (hi - lo).cast("double")))))
}
