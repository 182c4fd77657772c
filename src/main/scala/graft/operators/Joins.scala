package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as builtins (SURVEY-adjacent scale ops).
  *
  * The naive formulation of a point-in-time join —
  * `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + per-row argmax — plans as a
  * non-equi join (BroadcastNestedLoop or a skewed range explosion) and
  * falls over at scale. The implementations here stay in equi-join /
  * single-shuffle territory regardless of data size.
  */
object Joins {

  /** As-of (point-in-time) join: for every left row, the single most
    * recent right row with `rightTs <= leftTs` on the same key — the
    * trades↔quotes / features↔labels alignment primitive.
    *
    * Union-window form: tag both sides, union them, and carry the latest
    * right-side values forward with `last(_, ignoreNulls)` over
    * (key ORDER BY ts, side) — right rows sort before the left row at
    * equal ts, so the match is INCLUSIVE (ties count), matching DuckDB's
    * `ASOF JOIN ... ON l.ts >= r.ts` which the oracle twin uses. ONE
    * shuffle on the key, no range explosion; at 100 TB this is a plain
    * window over the unioned stream.
    *
    * Right rows must be unique per (keys, rightTs) — dedup first
    * (`Relational.dedupByKey`) so the winner at a tied timestamp is
    * well-defined.
    *
    * @param valueCols right-side columns to carry; emitted as
    *                  `asof_<name>` (null when no right row precedes)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    // the carried payload is ONE struct per right row — non-null even
    // when its members are null, so a matched right row with a null
    // value yields null (as-of semantics) instead of silently falling
    // back to an older row's value
    val rTagged = right.select(
        (keys.map(col) :+ col(rightTs).as("__ts")) :+
          struct(valueCols.map(col): _*).as("__rv"): _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    valueCols.foldLeft(carried) { (acc, c) =>
      acc.withColumn(s"asof_$c", col("__rv").getField(c))
    }
      .filter(col("__side") === 1)
      .select((lCols ++ valueCols.map(c => s"asof_$c")).map(col): _*)
  }

  /** Range (interval) join: left points against right intervals
    * `[lo, hi)` on the same key. The naive `ON p >= lo AND p < hi` is a
    * nested-loop plan; this binned form equi-joins on (key, bin) where
    * bin = floor(value / binWidth), exploding each interval only into the
    * bins it overlaps (intervals ≪ binWidth ⇒ ~1-2 bins each), then
    * refines with the exact predicate. Candidates scale with overlap
    * density, not |L|×|R|.
    *
    * @param binWidth bucket width in point units — choose ≥ the typical
    *                 interval length so explosion stays O(1) per interval
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth),
        // hi is exclusive: a hi exactly on a bin edge contributes nothing
        // to that bin, but sequence() is inclusive — the refine filter
        // removes any false candidates it admits
        floor(col(hiCol) / binWidth))))
    val joined = p
      .join(i, keys.map(k => p(k) === i(k)).reduce(_ && _) && p("__bin") === i("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
    keys.foldLeft(joined)((acc, k) => acc.drop(i(k)))
      .drop(p("__bin")).drop(i("__bin"))
  }
}
