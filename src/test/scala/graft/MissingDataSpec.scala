package graft

import org.apache.spark.sql.functions._

import graft.operators.MissingData

case class NRow(id: Long, grp: String, a: Option[Double], b: Option[Double])

class MissingDataSpec extends SparkSpec {

  private def fixture = df(Seq(
    NRow(1, "g1", None, Some(1.0)),
    NRow(2, "g1", Some(2.0), None),
    NRow(3, "g1", None, Some(3.0)),
    NRow(4, "g2", Some(4.0), None),
    NRow(5, "g2", None, None)))

  test("nullCountPerColumn, descending") {
    val out = MissingData.nullCountPerColumn(fixture, Seq("a", "b")).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 3L)))
  }

  test("nullPctPerColumn") {
    val out = MissingData.nullPctPerColumn(fixture, Seq("a", "b")).collect()
    assert(out.forall(r => approx(r.getDouble(1), 60.0)))
  }

  test("totalNullPct is the grand mean") {
    assert(approx(MissingData.totalNullPct(fixture, Seq("a", "b")).head().getDouble(0), 60.0))
  }

  test("dropnaRows drops any-null rows over the listed columns") {
    assert(MissingData.dropnaRows(fixture, Seq("a", "b")).count() == 0)
    assert(MissingData.dropnaRows(fixture, Seq("b")).count() == 2)
  }

  test("dropSparseColumns drops only columns above the threshold") {
    val out = MissingData.dropSparseColumns(fixture, Seq("a", "b"), maxNullPct = 50.0)
    assert(!out.columns.contains("a") && !out.columns.contains("b"))
    val keep = MissingData.dropSparseColumns(fixture, Seq("a", "b"), maxNullPct = 60.0)
    assert(keep.columns.contains("a") && keep.columns.contains("b"))
  }

  test("ffillBfill: forward fill wins, backward fills the leading gap") {
    val out = MissingData.ffillBfill(fixture, Seq(col("grp")), Seq(col("id")), Seq("a"))
      .orderBy("id").collect().map(r => r.getAs[Double]("a"))
    // g1: [null,2,null] -> bfill head -> [2,2,2]; g2: [4,null] -> ffill -> [4,4]
    assert(out.toSeq == Seq(2.0, 2.0, 2.0, 4.0, 4.0))
  }

  test("ffillBfill postcondition: no nulls when each partition has a value") {
    val out = MissingData.ffillBfill(fixture, Seq(col("grp")), Seq(col("id")), Seq("a", "b"))
    // g2.b is all-null -> stays null; a is fully imputed
    assert(MissingData.totalNullCount(out, Seq("a")).head().getLong(0) == 0)
    assert(MissingData.totalNullCount(out, Seq("b")).head().getLong(0) == 2)
  }

  test("ffillBfill is idempotent") {
    val once = MissingData.ffillBfill(fixture, Seq(col("grp")), Seq(col("id")), Seq("a"))
    val twice = MissingData.ffillBfill(once, Seq(col("grp")), Seq(col("id")), Seq("a"))
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("totalNullCount") {
    assert(MissingData.totalNullCount(fixture, Seq("a", "b")).head().getLong(0) == 6)
  }

  test("interpolateLinear: interior linear, trailing padded, leading stays null") {
    // g1: (null, 1, null, null, 4, null) by position ->
    //     (null, 1, 2, 3, 4, 4): gap of 2 interpolates 1→4; tail pads; head stays
    val d = df(Seq(
      NRow(1, "g1", None, None), NRow(2, "g1", Some(1.0), None),
      NRow(3, "g1", None, None), NRow(4, "g1", None, None),
      NRow(5, "g1", Some(4.0), None), NRow(6, "g1", None, None),
      NRow(7, "g2", Some(9.0), None)))
    val out = MissingData.interpolateLinear(d, Seq(col("grp")), Seq(col("id")), "a", "ai")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("ai")).map(_.toDouble)).toMap
    assert(out == Map(
      1L -> None, 2L -> Some(1.0), 3L -> Some(2.0), 4L -> Some(3.0),
      5L -> Some(4.0), 6L -> Some(4.0), 7L -> Some(9.0)))
  }
}
