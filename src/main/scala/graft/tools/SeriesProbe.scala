package graft.tools

import org.apache.spark.sql.SparkSession

/** Series-dimension scale probe for `ml_ensemble_grouped` (VERDICT r9 ask
  * #8): run the SAME grouped-ensemble template over series keys of
  * growing cardinality on FIXED data, so the recorded cost curve shows
  * the query scaling with the series dimension (the reference's 424
  * commodities → a 100 TB tenant's 10⁵⁺ series) rather than with
  * rows-per-series. One warmup pass, then one timed pass per key.
  *
  * Usage: runMain graft.tools.SeriesProbe <sfDir>
  */
object SeriesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.events(spark, sfDir).createOrReplaceTempView("events_probe")
    val keys = Seq(
      5 -> "event_type",
      50 -> "concat(event_type, '_', CAST(user_id % 10 AS STRING))",
      250 -> "concat(event_type, '_', CAST(user_id % 50 AS STRING))",
      1000 -> "concat(event_type, '_', CAST(user_id % 200 AS STRING))")
    def run(series: String): Long =
      spark.sql(graft.queries.R10.groupedEnsembleSql(
        "events_probe", "ts_ns div 1800000000000", series, "")).count()
    run(keys.head._2) // warmup: codegen + parquet reader + shuffle machinery
    val timed = keys.map { case (n, k) =>
      val t0 = System.nanoTime()
      val rows = run(k)
      (n, rows, (System.nanoTime() - t0) / 1e9)
    }
    val qs = timed.map { case (n, rows, sec) =>
      f"""{"n_series":$n,"rows":$rows,"sec":$sec%.3f}""" }.mkString("[", ",", "]")
    println(s"""{"probe":"grouped_ensemble_series","sf":"$sfDir","runs":$qs}""")
    spark.stop()
  }
}
