package graft.operators

import graft.queries.Grid

/** The Page–Hinkley arithmetic of `stat_page_hinkley`'s SQL template,
  * replicated operation-for-operation for the streaming twin
  * (`stream_page_hinkley`): grid-6 bucket means → grid-6 returns →
  * adaptive (δ, λ) from exact DECIMAL return moments → grid-9 one-sided
  * terms accumulated in exact BigDecimal with running minima → the
  * DECIMAL alarm comparison. Everything the SQL carries in DECIMAL is a
  * scale-fixed BigDecimal here; every double expression mirrors the SQL
  * text's operator order, so the stream's final snapshot hash-matches
  * the same DuckDB oracle as the batch scan. */
object PageHinkley {

  /** One series' summary row: (n_returns, ph_max_up, ph_max_down,
    * lambda, alarm_up_bucket, alarm_down_bucket, alarmed). None until
    * the series has ≥2 bars and a positive return σ. */
  def fromBars(bars: Seq[(Long, Double)])
      : Option[(Long, Double, Double, Double,
                Option[Long], Option[Long], Int)] = {
    val sorted = bars.sortBy(_._1)
    if (sorted.length < 2) return None
    // r0/rr: grid-6 simple returns with the signed-zero guard
    val rs = sorted.sliding(2).map { case Seq((_, p0), (b1, p1)) =>
      (b1, Grid.r9((p1 - p0) / p0, 6) + 0.0)
    }.toVector
    val n = rs.length
    def d6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // tol: DECIMAL(24,6)-operand moments (exact), then the SQL's doubles
    val sr = rs.map(r => d6(r._2)).sum.toDouble
    val prr = rs.map(r => d6(r._2) * d6(r._2)).sum.toDouble
    val sigma = math.sqrt((prr - sr * sr / n) / n)
    if (!(sigma > 0.0)) return None
    val delta = Grid.r9(0.5 * sigma, 6)
    val lambda = BigDecimal(Grid.r9(8 * sigma, 6)).setScale(9)
    // c/t/u/ph: exact DECIMAL cumulative sums of grid-9 terms + running
    // minima; cs is the SQL's CAST(sum AS DOUBLE) per step
    var csAcc = BigDecimal(0).setScale(6)
    var u = BigDecimal(0).setScale(9)
    var dAcc = BigDecimal(0).setScale(9)
    var minU = u
    var minD = dAcc
    var phMaxU = BigDecimal(0).setScale(9)
    var phMaxD = BigDecimal(0).setScale(9)
    var alarmUp: Option[Long] = None
    var alarmDown: Option[Long] = None
    var i = 0
    rs.foreach { case (b, r) =>
      i += 1
      csAcc += d6(r)
      val cs = csAcc.toDouble
      val tu = BigDecimal(Grid.r9(r - cs / i - delta)).setScale(9)
      val td = BigDecimal(Grid.r9(cs / i - r - delta)).setScale(9)
      u += tu
      dAcc += td
      if (u < minU) minU = u
      if (dAcc < minD) minD = dAcc
      val phu = u - minU
      val phd = dAcc - minD
      if (phu > phMaxU) phMaxU = phu
      if (phd > phMaxD) phMaxD = phd
      if (alarmUp.isEmpty && phu > lambda) alarmUp = Some(b)
      if (alarmDown.isEmpty && phd > lambda) alarmDown = Some(b)
    }
    Some((n.toLong, Grid.r9(phMaxU.toDouble), Grid.r9(phMaxD.toDouble),
      Grid.r9(lambda.toDouble, 6), alarmUp, alarmDown,
      if (alarmUp.isDefined || alarmDown.isDefined) 1 else 0))
  }
}
