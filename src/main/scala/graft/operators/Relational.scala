package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StructField}

/** Projection / filter / sort / dedup / top-k operators (SURVEY.md §2.2,
  * §2.4). All are thin declarative compositions — Catalyst handles
  * pushdown, pruning and ordering; nothing here materializes on the
  * driver except explicitly-documented adaptive steps.
  */
object Relational {

  /** `project_by_name_predicate` (reference `app.py:96-97`): select the
    * columns whose *name and type* satisfy a predicate. Schema-driven, so
    * the work is driver-side metadata only; the resulting `select` prunes
    * the scan. */
  def selectByNamePredicate(df: DataFrame, pred: StructField => Boolean): DataFrame = {
    val cols = df.schema.fields.filter(pred).map(f => col(f.name))
    df.select(cols.toIndexedSeq: _*)
  }

  /** Numeric columns whose name does NOT contain `" - "` — the reference's
    * feature/target discriminator (`app.py:96-97`). */
  def featureColumns(df: DataFrame): Seq[String] =
    df.schema.fields
      .filter(f => !f.name.contains(" - ") && f.dataType.isInstanceOf[NumericType])
      .map(_.name).toIndexedSeq

  def targetColumns(df: DataFrame): Seq[String] =
    df.schema.fields.filter(_.name.contains(" - ")).map(_.name).toIndexedSeq

  /** `dup_count` (`Marilyn_Cleaning.ipynb` cell 55): number of rows that
    * are exact duplicates of an earlier row: COUNT(*) − COUNT(DISTINCT).
    * The distinct key is `xxhash64` of the whole row, so the exact-distinct
    * shuffle carries 8-byte keys instead of full-width rows — the same
    * content-hash trick as `Dedup.exactByContent` (at 100 TB the shuffle
    * volume is what dominates; a 64-bit hash collision across the dataset
    * is vanishingly unlikely and only perturbs a diagnostic count). */
  def dupCount(df: DataFrame): DataFrame = {
    val rowHash = xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))
    df.agg((count(lit(1)) - countDistinct(rowHash)).as("n_duplicates"))
  }

  /** `sample_stratified`: per-stratum sampling rates for training-data
    * rebalancing (downsample dominant languages/sources). Rates are
    * per-mille integers against a deterministic `assign ∈ [0, 1000)`
    * column — production uses `pmod(xxhash64(id), 1000)` (uniform,
    * seedable, shuffle-free, stable under re-runs and repartitioning);
    * the oracle twin uses `pmod(id, 1000)` so plain SQL reproduces it.
    * Strata not in the map are dropped (rate 0). Pure narrow filter —
    * no shuffle, no sampleBy's per-partition RNG nondeterminism. */
  def stratifiedSample(df: DataFrame, strata: Column,
                       ratePerMille: Map[String, Int], assign: Column): DataFrame = {
    val rate = ratePerMille.foldLeft(lit(0)) { case (acc, (k, r)) =>
      when(strata === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(assign < rate)
  }

  /** Two-phase salted aggregation for skewed group keys: phase 1 groups
    * on (keys, salt) so a hot key spreads over `buckets` reducers; phase
    * 2 merges the partials on the keys alone — the second shuffle carries
    * one row per (key, salt), which is tiny. Map-side combining already
    * absorbs moderate skew; salting caps the WORST reducer at
    * 1/buckets of the hot key when one key dominates a 100 TB shuffle.
    *
    * `salt` must be deterministic (derive from a row id, e.g.
    * `pmod(xxhash64(id), buckets)`) so retries re-aggregate identically.
    * Aggregates must be algebraic: each entry is (output name, phase-1
    * aggregate, phase-2 merge of the partial column) — e.g. count→sum,
    * sum→sum, min→min. Use order-insensitive accumulation (integers /
    * decimals) when exactness matters: salting reorders float sums. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Column, buckets: Int,
                aggs: Seq[(String, Column, Column => Column)]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val phase1 = df.withColumn("__salt", pmod(salt, lit(buckets)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, a, _) => a.as(s"__p_$n") }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, _, m) => m(col(s"__p_$n")).as(n) }: _*)
  }

  /** `dedup_by_key` (`Marilyn_Cleaning.ipynb` cell 64,
    * `drop_duplicates(subset=…)`): keep exactly one row per key. pandas
    * keeps the *first in frame order*; distributed frames have no frame
    * order, so the caller supplies an explicit tiebreaker ordering —
    * `row_number() == 1` over (key, tiebreak). One shuffle on the key. */
  def dedupByKey(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** `topk_by_variance` (`Marilyn_Cleaning.ipynb` cell 61): rank columns by
    * sample variance, keep the top k. One map-side-combinable aggregate
    * over all columns at once (single pass over the data regardless of
    * column count), then a driver-negligible unpivot + limit. */
  def topKByVariance(df: DataFrame, cols: Seq[String], k: Int): DataFrame =
    unpivotAgg(df, cols, c => var_samp(col(c)), "column_name", "variance")
      .orderBy(desc("variance"), asc("column_name"))
      .limit(k)

  /** One row per column: `agg(col)` computed for every column in a single
    * aggregate pass, then unpivoted to long form (column_name, value). */
  def unpivotAgg(df: DataFrame, cols: Seq[String], agg: String => Column,
                 nameCol: String, valueCol: String): DataFrame = {
    val wide = df.agg(agg(cols.head).as(cols.head),
                      cols.tail.map(c => agg(c).as(c)): _*)
    wide.unpivot(Array.empty[Column], cols.map(col).toArray, nameCol, valueCol)
  }

  /** `tail_n` (`app.py:483-491`): last n rows by an ordering, returned in
    * ascending order. TakeOrdered on the reversed order (no global sort of
    * the full data), then an n-row re-sort. */
  def tailN(df: DataFrame, orderCols: Seq[Column], n: Int): DataFrame =
    df.orderBy(orderCols.map(_.desc): _*).limit(n)
      .orderBy(orderCols.map(_.asc): _*)

  /** `check_monotonic` (`Marilyn_Cleaning.ipynb` cell 58):
    * is `valueCol` non-decreasing when ordered by `orderCol`? Lag window +
    * global conjunction; returns one row `(is_monotonic: boolean)`. */
  def isMonotonic(df: DataFrame, partition: Seq[Column], orderCol: Column,
                  valueCol: Column): DataFrame = {
    val w = (if (partition.isEmpty) Window.orderBy(orderCol)
             else Window.partitionBy(partition: _*).orderBy(orderCol))
    df.withColumn("__prev", lag(valueCol, 1).over(w))
      .agg(coalesce(min(col("__prev").isNull || (valueCol >= col("__prev"))), lit(true))
        .as("is_monotonic"))
  }
}
