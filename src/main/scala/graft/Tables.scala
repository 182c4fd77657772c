package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Loaders for the harness star schema (TESTDATA.md): parquet tables under
  * `/root/testdata/sf*`. Parquet-at-rest is this engine's chosen format
  * (the reference is CSV-only — SURVEY.md §2.1); filters and column
  * projections placed on top of these scans reach the parquet reader via
  * Catalyst pushdown (`PushedFilters` / `ReadSchema`), which is the scan
  * behaviour we want at 100 TB.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Days since 1970-01-01 of a timestamp column — the engine-wide
    * `date_id` derivation. Every oracle pins the same epoch
    * (`date_diff('day', DATE '1970-01-01', …)` on the DuckDB side), so
    * this must stay the single Scala-side source of it. */
  def epochDay(ts: Column): Column = {
    import org.apache.spark.sql.functions.{datediff, lit}
    datediff(ts.cast("date"), lit("1970-01-01").cast("date"))
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot represent
    * (TimestampType is microseconds). Read it as a raw long (`nanosAsLong`)
    * and expose:
    *   - `ts_ns`: LongType nanos since epoch — the canonical, lossless
    *     ordering/equality key (what the oracle compares via `epoch_ns`);
    *   - `ts`: TimestampType truncated to micros — for calendar ops
    *     (day/year truncation is unaffected by the dropped sub-µs part).
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def events(spark: SparkSession, dir: String): DataFrame = loadEvents(spark, dir)
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
