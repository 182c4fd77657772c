package graft.tools

import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.SparkSession

import graft.ml.{Models, ModelingFrame}

/** A/B: GBT fit with/without node-ID caching — output identity check.
  * Throwaway profiling harness. */
object FitProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val label = ModelingFrame.Target
    val f1 = ModelingFrame.assembledFine(spark, sfDir).coalesce(1).cache()
    f1.count()

    for (cache <- Seq(false, true); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val m = new GBTRegressor()
        .setFeaturesCol(Models.FeaturesCol).setLabelCol(label)
        .setMaxIter(20).setSeed(42).setCacheNodeIds(cache)
        .fit(f1)
      val dt = (System.nanoTime() - t0) / 1e9
      val p = m.transform(f1).select("prediction").collect().map(_.getDouble(0))
      System.err.println(f"[probe2] gbt cacheNodeIds=$cache rep$rep fit ${dt}%.2f s checksum ${p.sum}%.9f")
    }
    spark.stop()
  }
}
