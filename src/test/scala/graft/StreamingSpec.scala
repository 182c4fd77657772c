package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals the batch aggregation (availableNow)") {
    val got = EventStream.runWindowedOnce(spark, dir, "win_test")
      .orderBy("day", "event_type").collect()
    val want = Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("day", "event_type").collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("streaming content dedup emits each distinct text once (equals batch DISTINCT)") {
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)](
      42, spark, None)
    val t0 = 1700000000000L
    mem.addData(Seq(
      (new java.sql.Timestamp(t0), "alpha"), (new java.sql.Timestamp(t0 + 1000), "beta"),
      (new java.sql.Timestamp(t0 + 2000), "alpha"), (new java.sql.Timestamp(t0 + 3000), "gamma"),
      (new java.sql.Timestamp(t0 + 4000), "beta")))
    val deduped = EventStream.dedupByContent(
      mem.toDF().toDF("ts", "text"), "ts", "text", watermark = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val texts = spark.table("dedup_test").select("text").collect().map(_.getString(0)).sorted
    assert(texts.toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("drift monitor: first batch has z=0, state accumulates all rows") {
    val events = EventStream.readEvents(spark, dir)
    val q = EventStream.driftMonitor(events)
      .writeStream.format("memory").queryName("drift_test")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("drift_test").collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n_total")).sum
    assert(total == Tables.events(spark, dir).count())
    // single micro-batch -> no prior state -> no drift flags
    assert(out.forall(!_.getAs[Boolean]("drift")))
  }
}
