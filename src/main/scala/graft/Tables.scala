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

  /** `events.ts` has shipped in two at-rest encodings across harness
    * generations — parquet TIMESTAMP(NANOS) (which Spark cannot
    * represent; `nanosAsLong` surfaces it as a raw long) and plain
    * TIMESTAMP(MICROS). [[normalizeEventTs]] makes the engine contract
    * independent of which one is on disk:
    *   - `ts_ns`: LongType nanos since epoch — the canonical, lossless
    *     ordering/equality key (what the oracle compares via
    *     `epoch_ns`/`epoch_us`; for µs-at-rest data the ×1000 widening
    *     is exact, so both encodings produce identical ts_ns semantics);
    *   - `ts`: TimestampType at micros — for calendar ops (day/year
    *     truncation is unaffected by any dropped sub-µs part).
    * Column order is pinned to the historical layout (ts_ns in the
    * original ts position, µs ts appended last). Sessions are UTC
    * engine-wide (Verify/Bench/tests), which is what makes the
    * NTZ-at-rest → instant interpretation match DuckDB's naive read.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, timestamp_micros, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // The µs branch casts NTZ-at-rest values through the SESSION timezone;
    // the canonical ts_ns key silently shifts under any non-UTC session.
    // Every entry point (Bench/Verify/tests) pins UTC — fail fast rather
    // than produce shifted keys if a future caller forgets.
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    require(tz == "UTC",
      s"events ts normalization requires spark.sql.session.timeZone=UTC, got $tz")
    df.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) at rest, read as raw ns longs
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // TIMESTAMP/TIMESTAMP_NTZ (µs) at rest
        val ts = col("ts").cast(TimestampType)
        val inPlace = df.columns.toIndexedSeq.map {
          case "ts" => (unix_micros(ts) * lit(1000L)).as("ts_ns")
          case c    => col(c)
        }
        df.select(inPlace :+ ts.as("ts"): _*)
    }
  }

  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
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
