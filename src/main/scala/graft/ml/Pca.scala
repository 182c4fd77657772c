package graft.ml

import breeze.linalg.{eigSym, DenseMatrix}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal component analysis, distributed the only way PCA ever is:
  * ONE aggregation collapses the data to the k×k second-moment matrix
  * (k + k(k+1)/2 codegen'd SQL aggregates, map-side combined — the data
  * is scanned once regardless of row count), and the k×k eigen-solve
  * runs on the driver (model-sized math, like every `fit()` here; k is
  * the FEATURE count, never the row count, so this holds at 100 TB).
  *
  * Matches sklearn `PCA` semantics: covariance with the n−1 denominator,
  * components sorted by descending eigenvalue, and a deterministic sign
  * convention (the largest-|loading| coordinate of each component is
  * positive — sklearn's `svd_flip` analog, so two runs and two
  * implementations agree on more than just the spans). */
object Pca {

  final case class PcaModel(features: Seq[String], mean: Seq[Double],
                            eigenvalues: Seq[Double],
                            components: Seq[Seq[Double]]) {
    def explainedRatio: Seq[Double] = {
      val tot = eigenvalues.sum
      eigenvalues.map(_ / tot)
    }
  }

  def fit(df: DataFrame, featureCols: Seq[String]): PcaModel = {
    val k = featureCols.size
    require(k >= 1, "need at least one feature")
    val sums = featureCols.map(c => sum(col(c).cast("double")).as(s"s_$c"))
    val prods = for { i <- 0 until k; j <- i until k } yield
      sum((col(featureCols(i)) * col(featureCols(j))).cast("double"))
        .as(s"p_${i}_$j")
    val aggs = (count(lit(1)).as("n") +: sums) ++ prods
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("n").toDouble
    require(n > 1, "PCA needs n > 1 rows")
    val mu = featureCols.map(c => r.getAs[Double](s"s_$c") / n)
    val cov = DenseMatrix.zeros[Double](k, k)
    for (i <- 0 until k; j <- i until k) {
      val cij = (r.getAs[Double](s"p_${i}_$j") - n * mu(i) * mu(j)) / (n - 1)
      cov(i, j) = cij
      cov(j, i) = cij
    }
    val es = eigSym(cov)
    // eigSym returns ascending eigenvalues; emit descending
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).map(_._2).toSeq
    val comps = order.map { c =>
      val v = (0 until k).map(i => es.eigenvectors(i, c))
      val flip = if (v(v.indices.maxBy(i => math.abs(v(i)))) < 0) -1.0 else 1.0
      v.map(_ * flip)
    }
    PcaModel(featureCols, mu, order.map(es.eigenvalues(_)), comps)
  }
}
