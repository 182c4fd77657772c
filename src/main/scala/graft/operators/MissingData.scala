package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Missing-data operators — the core of the reference's cleaning pipeline
  * (SURVEY.md §2.3; `Marilyn_Cleaning.ipynb` cells 9-52).
  *
  * Null profiling is computed for *all* columns in one aggregate pass
  * (map-side combinable — one shuffle of one row per partition, never a
  * per-column job), which is what keeps these viable on a 100 TB table
  * with hundreds of columns.
  */
object MissingData {

  /** `agg_null_count_per_col` (cells 9/12/24): per-column null counts,
    * long form (column_name, n_nulls), descending. */
  def nullCountPerColumn(df: DataFrame, cols: Seq[String]): DataFrame =
    Relational.unpivotAgg(df, cols,
        c => count(when(col(c).isNull, lit(1))), "column_name", "n_nulls")
      .orderBy(desc("n_nulls"), asc("column_name"))

  /** `agg_null_pct_per_col` (cells 15/26): per-column null percentage. */
  def nullPctPerColumn(df: DataFrame, cols: Seq[String]): DataFrame =
    Relational.unpivotAgg(df, cols,
        c => avg(when(col(c).isNull, lit(1.0)).otherwise(lit(0.0))) * 100,
        "column_name", "null_pct")
      .orderBy(desc("null_pct"), asc("column_name"))

  /** `agg_null_pct_total` (cell 9, `isna().mean().mean()*100`): grand mean
    * of the per-column null fractions. */
  def totalNullPct(df: DataFrame, cols: Seq[String]): DataFrame =
    nullPctPerColumn(df, cols).agg(avg(col("null_pct")).as("total_null_pct"))

  /** `dropna_rows` (cell 44): drop rows with a null in ANY of `cols`. */
  def dropnaRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop("any", cols)

  /** `drop_sparse_columns` (cell 47): drop columns whose null percentage
    * exceeds `maxNullPct`. Adaptive two-phase statement (SURVEY.md §4.3):
    * action #1 computes per-column null fractions (one aggregate row
    * collected to the driver — O(columns) bytes, never O(rows)); the
    * result parameterizes the projection of plan #2. Deterministic — no
    * sampling — so verify/replay is stable. */
  def dropSparseColumns(df: DataFrame, candidates: Seq[String], maxNullPct: Double): DataFrame = {
    val fracs = df.select(candidates.map(c =>
      avg(when(col(c).isNull, lit(1.0)).otherwise(lit(0.0))).as(c)): _*).head()
    val dropped = candidates.filter(c => fracs.getAs[Double](c) * 100 > maxNullPct)
    df.drop(dropped: _*)
  }

  /** `impute_ffill_bfill` (cell 50: `sort_values('date_id')` +
    * `fillna(ffill).fillna(bfill)`): forward-fill then backward-fill each
    * column along the series order.
    *
    * Implemented as two frame windows — `last(ignoreNulls)` over
    * (unbounded preceding → current) then `first(ignoreNulls)` over
    * (current → unbounded following). The reference's series is one global
    * 1961-row sequence; at scale the caller MUST partition by a series key
    * (`partition`) so each window is a parallel, bounded task instead of a
    * single-task global sort (SURVEY.md §4.3.3). */
  def ffillBfill(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                 cols: Seq[String]): DataFrame = {
    def spec(lo: Long, hi: Long): WindowSpec = {
      val base = if (partition.isEmpty) Window.orderBy(order: _*)
                 else Window.partitionBy(partition: _*).orderBy(order: _*)
      base.rowsBetween(lo, hi)
    }
    val wPrev = spec(Window.unboundedPreceding, Window.currentRow)
    val wNext = spec(Window.currentRow, Window.unboundedFollowing)
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        coalesce(last(col(c), ignoreNulls = true).over(wPrev),
                 first(col(c), ignoreNulls = true).over(wNext)))
    }
  }

  /** Linear time interpolation (pandas `interpolate()` semantics, the
    * imputation step between ffill and model-based filling): interior
    * nulls get the position-linear value between the nearest known
    * neighbors, trailing nulls carry the last known value, leading nulls
    * stay null. Four IGNORE-NULLS window functions over two frames of the
    * SAME (partition, order) spec — one sort per series, no joins; same
    * scale posture as [[ffillBfill]]. */
  def interpolateLinear(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                        valueCol: String, outCol: String): DataFrame = {
    val base = if (partition.isEmpty) Window.orderBy(order: _*)
               else Window.partitionBy(partition: _*).orderBy(order: _*)
    val wPrev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val rn = row_number().over(base)
    val pv = last(v, ignoreNulls = true).over(wPrev)
    val prn = last(when(v.isNotNull, rn), ignoreNulls = true).over(wPrev)
    val nv = first(v, ignoreNulls = true).over(wNext)
    val nrn = first(when(v.isNotNull, rn), ignoreNulls = true).over(wNext)
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(pv.isNotNull && nv.isNotNull,
          pv + (nv - pv) * (rn - prn) / (nrn - prn))
        .when(pv.isNotNull, pv))
  }

  /** `check_no_nulls` (cell 52): total null count across `cols`; one row,
    * expected 0 after cleaning. */
  def totalNullCount(df: DataFrame, cols: Seq[String]): DataFrame = {
    val perCol: Column = cols.map(c => count(when(col(c).isNull, lit(1)))).reduce(_ + _)
    df.agg(perCol.as("n_nulls"))
  }
}
