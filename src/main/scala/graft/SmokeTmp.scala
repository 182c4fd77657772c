object SmokeTmp {
  def main(a: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[T](n: String)(f: => T): T = { val t0=System.nanoTime; val r=f; System.err.println(f"[t] $n ${(System.nanoTime-t0)/1e9}%.1f s"); r }
    t("pairs-FIRST")(graft.queries.Docs.qs("dedup_simhash")(spark, d).count())
    val names = graft.SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ < "dedup_simhash")
    t("prefix-queries-" + names.size)(names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, d).count() catch { case _: Throwable => } })
    t("pairs-AFTER")(graft.queries.Docs.qs("dedup_simhash")(spark, d).count())
    spark.stop()
  }
}
