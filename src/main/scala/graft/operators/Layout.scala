package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering at rest and
  * the per-file statistics manifest that makes it pay off.
  *
  * At 100 TB, the scan you avoid is worth more than the scan you
  * optimize: a lake table format keeps (file → per-column min/max) and
  * plans only the files whose ranges intersect the predicate. That index
  * prunes well only if the WRITE clustered the data — each file covering
  * a narrow value range. A single-column sort gives that for one
  * dimension; interleaving bucketed dimensions on the Z-curve
  * ([[graft.functions.ZOrder]]) gives it for several at once.
  */
object Layout {

  /** Cluster-by-write: range-repartition on `orderCol` (one shuffle whose
    * boundaries come from a driver-side sample sketch) + an in-partition
    * sort, so each of the `nFiles` output files owns a compact, disjoint
    * `orderCol` range. This is exactly the shape of `OPTIMIZE ... ZORDER`
    * compaction jobs when `orderCol` is a z-value. */
  def writeClustered(df: DataFrame, orderCol: Column, outDir: String,
                     nFiles: Int): Unit =
    df.repartitionByRange(nFiles, orderCol).sortWithinPartitions(orderCol)
      .write.mode("overwrite").parquet(outDir)

  /** The statistics manifest: per-file min/max of `cols` — what a table
    * format records at commit time. One aggregation keyed by file name;
    * output is metadata-sized (rows = files, not records). */
  def fileStats(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Planning against the manifest: a file is a candidate for a
    * conjunction of range predicates iff its [min, max] interval
    * intersects every requested [lo, hi]. The scan reads candidates
    * only — the pruning a 100 TB query lives or dies by. */
  def candidateFiles(stats: DataFrame, box: Seq[(String, Long, Long)]): DataFrame =
    box.foldLeft(stats) { case (acc, (c, lo, hi)) =>
      acc.filter(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
    }

  /** The intersection test as one boolean column (same predicate as
    * [[candidateFiles]], kept as a flag instead of a filter so a
    * manifest query can EMIT the planning decision per file). */
  def candidateExpr(box: Seq[(String, Long, Long)]): Column =
    box.map { case (c, lo, hi) =>
      col(s"${c}_max") >= lo && col(s"${c}_min") <= hi
    }.reduce(_ && _)

  /** Deterministic grid-clustered write: `bucketCol` is a FIXED-WIDTH
    * range bucket of the cluster key (e.g. `z div 2^27` for 32 buckets
    * over the 32-bit z-domain), each bucket becoming one output
    * directory. Unlike [[writeClustered]]'s `repartitionByRange` (whose
    * boundaries come from a nondeterministic driver-side sample sketch),
    * the grid assignment is a pure row-local function of the data — no
    * global sort, no sampling, bit-for-bit reproducible by any engine —
    * which is what lets a DuckDB oracle replay the resulting manifest.
    * Equal-WIDTH buckets trade balanced file sizes for determinism; the
    * sampled range path stays the compaction default when only the
    * pruning (not the manifest hash) must be reproducible. */
  def writeGridBucketed(df: DataFrame, bucketCol: Column, outDir: String): Unit =
    df.withColumn("bucket", bucketCol)
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(outDir)

  /** Manifest of a [[writeGridBucketed]] layout read BACK from the files
    * at rest: per-bucket (= per-directory) min/max of `cols`. `bucket`
    * comes back as a partition column (int-inferred → cast to long). */
  def bucketStats(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(dir)
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
