package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scale probe for the live streaming entries' STATE (VERDICT r12 ask
  * #5): runs each named `SparkEntry` streaming entry to completion and
  * records, from the engine's own progress events, the number of
  * micro-batches, the peak stateful-operator row count, and the peak
  * state memory — the numbers that decide whether an entry's state is
  * watermark-bounded (flat in input volume) or input-shaped (grows with
  * it). Run at sf0.1 and a ScaleUp replica and compare.
  *
  * Usage: runMain graft.tools.StreamStateProbe <sfDir> <key1,key2,...>
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val keys = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    // one listener, drained between keys: entries run strictly one at a
    // time, so every event since the last drain belongs to the current key
    final case class Acc(var batches: Int = 0, var peakStateRows: Long = 0L,
                         var peakStateBytes: Long = 0L, var totalIn: Long = 0L)
    val acc = new java.util.concurrent.atomic.AtomicReference(Acc())
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val a = acc.get()
        a.synchronized {
          a.batches += 1
          a.totalIn += e.progress.numInputRows
          val rows = e.progress.stateOperators.map(_.numRowsTotal).sum
          val bytes = e.progress.stateOperators.map(_.memoryUsedBytes).sum
          if (rows > a.peakStateRows) a.peakStateRows = rows
          if (bytes > a.peakStateBytes) a.peakStateBytes = bytes
        }
      }
    })

    keys.foreach { k =>
      acc.set(Acc())
      val t0 = System.nanoTime()
      val res = try {
        val n = graft.SparkEntry.queries(k)(spark, dir).count()
        s"rows=$n"
      } catch { case e: Throwable => s"ERROR ${e.getClass.getSimpleName}" }
      val wall = (System.nanoTime() - t0) / 1e9
      // progress events are delivered async; give the bus a beat
      Thread.sleep(1500)
      val a = acc.get()
      println(f"[stateprobe] $k%-28s wall=$wall%7.2fs $res%-12s " +
        f"batches=${a.batches}%3d inputRows=${a.totalIn}%9d " +
        f"peakStateRows=${a.peakStateRows}%9d peakStateMB=${a.peakStateBytes / 1048576.0}%8.1f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
