package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared z-scaling moments for the driver-side L-BFGS models ([[Svr]],
  * [[Mlp]]): ONE aggregation job computing per-feature mean and
  * population std plus the label mean. A constant column gets std 1 so
  * the scale stays finite (its weight is then exactly zero anyway).
  */
private[ml] object Standardize {
  final case class Moments(mu: IndexedSeq[Double], sd: IndexedSeq[Double],
                           muY: Double)

  def moments(df: DataFrame, featureCols: Seq[String], label: String): Moments = {
    val aggs = featureCols.flatMap(c =>
      Seq(avg(col(c)).as(s"m_$c"), stddev_pop(col(c)).as(s"s_$c"))) :+
      avg(col(label)).as("m_y")
    val st = df.agg(aggs.head, aggs.tail: _*).head()
    val mu = featureCols.indices.map(i => st.getDouble(2 * i))
    val sd = featureCols.indices.map { i =>
      val s = st.getDouble(2 * i + 1); if (s > 0) s else 1.0 }
    Moments(mu, sd, st.getDouble(2 * featureCols.size))
  }
}
