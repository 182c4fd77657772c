package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-off profiling harness for the MLlib fit cost centers
  * (`ml_ensemble_weighted` / `serving_signal` / `graph_mst_boruvka`):
  * runs the named queries solo with a job/stage/task counter so the
  * triage can attribute wall-clock to scheduler round-trips vs compute.
  * Not part of the verify/bench contract.
  */
object FitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })

    val names = if (args.nonEmpty) args(0).split(",").toSeq
                else Seq("ml_ensemble_weighted")
    // warmup: one ridge fit primes MLlib/WLS codepaths
    graft.SparkEntry.queries("ml_ridge")(spark, sfDir).count()
    if (!args.contains("--no-tree-warmup")) {
      // prime the MLlib tree trainer on a tiny synthetic frame (JIT of
      // RandomForest.findBestSplits / DTStatsAggregator / NodeIdCache) —
      // no SparkEntry cache keys touched
      import spark.implicits._
      val tiny = graft.ml.Models.assemble(
        (1 to 64).map(i => (i.toDouble, i * 2.0, math.sin(i.toDouble)))
          .toDF("a", "b", "y"), Seq("a", "b")).coalesce(1).cache()
      tiny.count()
      graft.ml.Models.randomForest("y", numTrees = 10, maxDepth = 6).fit(tiny)
      tiny.unpersist()
    }
    Thread.sleep(500)
    names.foreach { name =>
      jobs = 0; stages = 0; tasks = 0L
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      System.err.println(f"[probe] $name%-28s ${dt}%8.2f s  jobs=$jobs stages=$stages tasks=$tasks")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
