package graft

import org.apache.spark.sql.functions._

import graft.pipelines.FeatureEngineering
import graft.pipelines.FeatureEngineering.PairSpec

case class Px(date_id: Long, pa: Double, pb: Double)

class FeatureEngineeringSpec extends SparkSpec {

  private def wide = df(Seq(
    Px(0, 100.0, 50.0), Px(1, 110.0, 55.0), Px(2, 121.0, 44.0), Px(3, 121.0, 44.0)))

  test("buildModelingTable: log-returns, lead-aligned spread target, tail drop") {
    val out = FeatureEngineering.buildModelingTable(
        wide, "date_id", Seq("pa", "pb"), Seq(PairSpec("pa", "pb", 1)))
      .orderBy("date_id").collect()
    // rows: date 0 dropped (no lag), date 3 dropped (no lead) -> 1 and 2
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(approx(out(0).getAs[Double]("lr_pa"), math.log(1.1)))
    // target at t=1 = spread at t=2 = ln(121/110) - ln(44/55)
    assert(approx(out(0).getAs[Double]("pa - pb"),
      math.log(121.0 / 110.0) - math.log(44.0 / 55.0)))
    // t=2 target = spread at t=3 = 0 - 0
    assert(approx(out(1).getAs[Double]("pa - pb"), 0.0))
  }

  test("leakage safety: target at t only uses values after t") {
    // perturb the PAST (t=0): targets at t>=1 must not change
    val perturbed = df(Seq(
      Px(0, 999.0, 1.0), Px(1, 110.0, 55.0), Px(2, 121.0, 44.0), Px(3, 121.0, 44.0)))
    def targets(w: org.apache.spark.sql.DataFrame) =
      FeatureEngineering.buildModelingTable(w, "date_id", Seq("pa", "pb"),
          Seq(PairSpec("pa", "pb", 1)))
        .orderBy("date_id").collect().map(_.getAs[Double]("pa - pb")).toSeq
    assert(targets(wide) == targets(perturbed))
  }

  test("featureTargetSplit honors the ' - ' naming contract") {
    val out = FeatureEngineering.buildModelingTable(
      wide, "date_id", Seq("pa", "pb"), Seq(PairSpec("pa", "pb", 1)))
    val (feats, targs) = FeatureEngineering.featureTargetSplit(out)
    assert(targs == Seq("pa - pb"))
    assert(feats.toSet == Set("date_id", "lr_pa", "lr_pb"))
  }
}
