package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.operators.Layout

/** Z-order curve + clustered-layout pruning (`zorder_curve`,
  * `zorder_layout_prune`). The curve arithmetic is pinned against a
  * straightforward per-bit Scala reference; the layout test proves the
  * actual payoff — a 2-D box predicate touches fewer files under z-order
  * than under a single-column sort — on a written parquet layout. */
class ZOrderSpec extends SparkSpec {

  /** Per-bit reference interleave: bit i of x → bit 2i, y → 2i+1. */
  private def refZ(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zValue2 matches the per-bit reference interleave (sampled grid + corners)") {
    val s = spark; import s.implicits._
    val samples = for {
      x <- Seq(0L, 1L, 2L, 255L, 256L, 21845L, 43690L, 65534L, 65535L)
      y <- Seq(0L, 1L, 3L, 128L, 32767L, 65535L)
    } yield (x, y)
    val got = samples.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == refZ(x, y), s"interleave($x, $y): got $z, want ${refZ(x, y)}")
    }
  }

  test("quantize hits both ends: lo -> 0, hi -> 65535, interior in range, degenerate -> 0") {
    val s = spark; import s.implicits._
    val rows = Seq((0L, 10.0), (1L, 55.5), (2L, 99.0)).toDF("id", "v")
      .crossJoin(broadcast(Seq((10.0, 99.0)).toDF("lo", "hi")))
      .select(col("id"), ZOrder.quantize(col("v"), col("lo"), col("hi")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) == 0L)
    assert(rows(2L) == 65535L)
    assert(rows(1L) > 0L && rows(1L) < 65535L)
    val degen = Seq((42.0, 42.0, 42.0)).toDF("v", "lo", "hi")
      .select(ZOrder.quantize(col("v"), col("lo"), col("hi")).as("q"))
      .head().getLong(0)
    assert(degen == 0L)
  }

  test("z-clustered layout prunes a 2-D box where the single-column sort cannot") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("value"), expr("ts_ns div 1000").as("ts_us"))
    val mm = e.agg(min(col("value")).as("vlo"), max(col("value")).as("vhi"),
      min(col("ts_us")).as("tlo"), max(col("ts_us")).as("thi"))
    val q = e.crossJoin(broadcast(mm))
      .select(col("event_id"),
        ZOrder.quantize(col("value"), col("vlo"), col("vhi")).as("zx"),
        ZOrder.quantize(col("ts_us"), col("tlo"), col("thi")).as("zy"))
      .withColumn("z", ZOrder.zValue2(col("zx"), col("zy")))
    val zDir = graft.sources.Scratch.dir("zorder_test", dir, "by_z")
    val lDir = graft.sources.Scratch.dir("zorder_test", dir, "by_time")
    Layout.writeClustered(q, col("z"), zDir, nFiles = 16)
    Layout.writeClustered(q, col("zy"), lDir, nFiles = 16)
    val box = Seq(("zx", 16384L, 32767L), ("zy", 16384L, 32767L))
    val zStats = Layout.fileStats(spark, zDir, Seq("zx", "zy"))
    val lStats = Layout.fileStats(spark, lDir, Seq("zx", "zy"))
    val (zAll, zCand) = (zStats.count(), Layout.candidateFiles(zStats, box).count())
    val (lAll, lCand) = (lStats.count(), Layout.candidateFiles(lStats, box).count())
    assert(zAll == 16 && lAll == 16)
    // the time-sorted control prunes its own dimension only: the box's zy
    // quarter -> ~1/4 of files survive; z-order prunes both dimensions ->
    // the 1/16-area box maps to a short z-range spanning ~1-3 files
    assert(zCand < lCand,
      s"z-order must beat the single-column sort: z=$zCand linear=$lCand")
    assert(zCand <= zAll / 4,
      s"z-order should prune the 1/16 box to <= 1/4 of files, got $zCand/$zAll")
    // correctness: pruning must never drop a matching row — every row in
    // the box lives in a candidate file
    val matching = spark.read.parquet(zDir)
      .filter(col("zx").between(16384, 32767) && col("zy").between(16384, 32767))
      .withColumn("file", input_file_name())
      .select("file").distinct()
    val cand = Layout.candidateFiles(zStats, box).select("file")
    assert(matching.join(cand, Seq("file"), "left_anti").count() == 0,
      "a file containing matching rows was pruned")
  }
}
