package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regression metrics + leakage-safe evaluation protocols
  * (SURVEY.md §2.9: `ml_metric_*`, `ml_walk_forward`, `ml_gridsearch`).
  *
  * Metrics are single-pass SQL aggregates (map-side combinable — one
  * reduce over (y, ŷ) pairs regardless of data size), NOT collect-based:
  * at 100 TB the prediction frame never touches the driver.
  */
object Evaluation {

  /** All reference metrics (README.md:40-46) in ONE aggregate pass: mae,
    * rmse, r2, mape, smape, directional accuracy. R² avoids a second scan
    * for ȳ via the sufficient statistics Σy, Σy², Σ(y−ŷ)². */
  def metricsFull(pred: DataFrame, y: String, yhat: String): DataFrame = {
    val e = col(y) - col(yhat)
    pred.agg(
        count(lit(1)).cast("long").as("n"),
        sum(col(y)).as("sy"), sum(col(y) * col(y)).as("syy"),
        sum(e * e).as("sse"),
        avg(abs(e)).as("mae"),
        sqrt(avg(e * e)).as("rmse"),
        avg(when(col(y) =!= 0, abs(e / col(y)))).as("mape"),
        avg(when(abs(col(y)) + abs(col(yhat)) =!= 0,
          abs(e) / ((abs(col(y)) + abs(col(yhat))) / 2))).as("smape"),
        avg((signum(col(y)) === signum(col(yhat))).cast("double")).as("dir_acc"))
      .withColumn("sst", col("syy") - col("sy") * col("sy") / col("n"))
      // single-valued y (e.g. a 1-row walk-forward fold) has SST = 0:
      // R² is undefined there — null, not a div-by-zero
      .withColumn("r2", when(col("sst") =!= 0, lit(1.0) - col("sse") / col("sst")))
      .select("n", "mae", "rmse", "r2", "mape", "smape", "dir_acc")
  }

  /** `ml_walk_forward` (README:36): expanding-window time splits. For cut
    * points c_1 < … < c_k: fold i trains on rows with timeCol < c_i and
    * tests on [c_i, c_{i+1}) — strictly leakage-free (train always earlier
    * than test). Returns (train, test) pairs lazily; each is a plain
    * filter over the source (predicate-pushdown-friendly — on a
    * date-partitioned 100 TB table each fold prunes partitions). */
  def walkForwardSplits(df: DataFrame, timeCol: String,
                        cuts: Seq[Long]): Seq[(DataFrame, DataFrame)] = {
    val bounds = cuts.zip(cuts.drop(1).map(Some(_)) :+ None)
    bounds.map { case (lo, hiOpt) =>
      val train = df.filter(col(timeCol) < lo)
      val test = hiOpt match {
        case Some(hi) => df.filter(col(timeCol) >= lo && col(timeCol) < hi)
        case None => df.filter(col(timeCol) >= lo)
      }
      (train, test)
    }
  }

  /** Evenly-spaced cut points from the time range (deterministic; one
    * min/max aggregate). */
  def timeCuts(df: DataFrame, timeCol: String, k: Int): Seq[Long] = {
    val r = df.agg(min(col(timeCol)).cast("long"), max(col(timeCol)).cast("long")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    // first cut at ~50% so the smallest training window is still half the data
    (1 to k).map(i => lo + ((hi - lo) * (k + i).toDouble / (2.0 * k)).toLong)
  }
}
