package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ml.{Ensemble, ModelingFrame}

/** Probe J (r15, VERDICT r14 ask #5): the Forest DISTRIBUTED fallback —
  * the one r14 code path with no scale row. Times `Ensemble.fitWeighted`
  * on the SAME assembled fine frame twice: (A) the default driver path
  * (content-seeded `graft.ml.Forest`, whole fit in one Spark job) and
  * (B) with `graft.ml.rfDriverFitLimit` forced below the frame size so
  * `fitDistributed` takes the MLlib RandomForest trainer. The two paths
  * are ALLOWED to differ bit-wise (content-seeded vs layout-seeded
  * trees), so the probe records the quality band (per-member and
  * ensemble R²/MAE from `Ensemble.report`) rather than bit-equality.
  * Run against the 10× replica (`SPARK_GRAFT_SF_DIR=/tmp/sf1probe`) —
  * the modeling frame is calendar-bounded, so the 10× cost lands in the
  * frame build + the distributed trainer's input scan, which is the
  * honest fallback shape. Throwaway profiling harness. */
object ForestFallbackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1probe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val label = ModelingFrame.Target
    val train = ModelingFrame.assembledFine(spark, sfDir).cache()
    val n = train.count()
    System.err.println(s"[probeJ] frame rows = $n ($sfDir)")

    def once(tag: String): Unit = {
      val t0 = System.nanoTime()
      val f = Ensemble.fitWeighted(train, label, numTrees = 100,
        rfMaxDepth = ModelingFrame.FineRfMaxDepth)
      val dt = (System.nanoTime() - t0) / 1e9
      val rep = Ensemble.report(f, train, label)
      val rows = rep.map { case (m, w, r2, mae) =>
        f"$m w=$w%.4f r2=$r2%.4f mae=$mae%.6f"
      }.mkString(" | ")
      System.err.println(f"[probeJ] $tag fit ${dt}%.2f s :: $rows")
    }

    // A: driver path (default 20k budget; frame is calendar-bounded)
    for (rep <- 1 to 2) once(s"A-driver rep$rep")

    // B: force the distributed MLlib fallback
    sys.props("graft.ml.rfDriverFitLimit") = "100"
    try for (rep <- 1 to 2) once(s"B-distributed rep$rep")
    finally { sys.props.remove("graft.ml.rfDriverFitLimit"); () }

    spark.stop()
  }
}
