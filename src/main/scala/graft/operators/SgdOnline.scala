package graft.operators

import graft.queries.Grid

/** The single-pass online-SGD arithmetic shared by the batch
  * `ml_sgd_online` scan and the streaming `stream_sgd_online` twin, so
  * both hash-match the SAME DuckDB recursive-CTE oracle bit for bit
  * (the `HwFilter` division of labor).
  *
  * `fold` is the sequential pass over the standardized series (the
  * batch engine feeds it from the shared z SQL). `fromBars` replicates
  * the z SQL's standardization NUMERICALLY for the streaming side,
  * where the bars live in operator state instead of a view: grid-6
  * bucket means ride exact scaled-6 integer sums (order-free, so
  * arrival order never matters), moments are exact BigDecimal sums of
  * scale-12 products, and every double expression mirrors the SQL text
  * operation for operation. */
object SgdOnline {

  val LearningRate = 0.05

  /** (i, zx, zy) in any order → (n_steps, w0, w1, rmse). */
  def fold(rows: Array[(Long, Double, Double)])
      : (Long, Double, Double, Double) = {
    val sorted = rows.sortBy(_._1)
    var w0 = 0.0
    var w1 = 0.0
    var sse = 0.0
    sorted.foreach { case (_, zx, zy) =>
      val pred = Grid.r9(w0 + w1 * zx)
      val err = Grid.r9(pred - zy) + 0.0
      w0 = Grid.r9(w0 - LearningRate * err) + 0.0
      w1 = Grid.r9(w1 - LearningRate * err * zx) + 0.0
      sse += err * err
    }
    (sorted.length.toLong, w0, w1, Grid.r6(math.sqrt(sse / sorted.length)))
  }

  /** `CAST(value AS DECIMAL(18,6))` as an exact scaled-6 long. */
  def scaled6(v: Double): Long =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  /** `round(CAST(sum AS DOUBLE) / count, 6)` over an exact scaled-6
    * sum — the shared SQL bucket-mean text. */
  def mean6(sum6: Long, cnt: Long): Double =
    Grid.r9(BigDecimal(java.math.BigDecimal.valueOf(sum6, 6)).toDouble / cnt, 6)

  /** The z SQL's standardization + the fold, over (bucket, x, y) bars
    * (x, y grid-6). None when fewer than 2 bars or a degenerate σ —
    * the stream emits nothing until the frame is standardizable. */
  def fromBars(bars: Seq[(Long, Double, Double)])
      : Option[(Long, Double, Double, Double)] = {
    val sorted = bars.sortBy(_._1)
    val n = sorted.length
    if (n < 2) return None
    def d6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // DECIMAL sums (order-free, exact): sx, sy at scale 6; pxx, pyy at
    // scale 12 — then the SQL's CAST(... AS DOUBLE) once per sum
    val sx = sorted.map(b => d6(b._2)).sum.toDouble
    val sy = sorted.map(b => d6(b._3)).sum.toDouble
    val pxx = sorted.map(b => d6(b._2) * d6(b._2)).sum.toDouble
    val pyy = sorted.map(b => d6(b._3) * d6(b._3)).sum.toDouble
    val mx = Grid.r9(sx / n, 6)
    val my = Grid.r9(sy / n, 6)
    val sdx = Grid.r9(math.sqrt((pxx - sx * sx / n) / n), 6)
    val sdy = Grid.r9(math.sqrt((pyy - sy * sy / n) / n), 6)
    if (sdx <= 0.0 || sdy <= 0.0) return None
    val z = sorted.zipWithIndex.map { case ((_, x, y), i) =>
      (i.toLong + 1L,
        Grid.r9((x - mx) / sdx, 6) + 0.0,
        Grid.r9((y - my) / sdy, 6) + 0.0)
    }
    Some(fold(z.toArray))
  }
}
