package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Builds the harness analog of the reference's modeling table
  * (`df_transformed.csv`, SURVEY.md §1.2): a compact wide frame keyed by a
  * time ordinal with one feature column per series and a next-period
  * target.
  *
  * Shape mirror: events → one row per day (`date_id` ordinal), features =
  * per-event-type daily mean value (explicit pivot values — deterministic
  * column set), target = next day's `click` mean (`lead(1)`, the
  * reference's lag-aligned target, `Marilyn_Cleaning.ipynb` cell 67).
  *
  * The day-level frame is tiny at any SF (the aggregation collapses
  * volume), so the single-partition lead window is bounded — the same
  * aggregate-then-window pattern that keeps this safe at 100 TB.
  */
object ModelingFrame {

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  val Target = "target_click_next"

  /** One row per day, one feature column per event type (pre-target). */
  def daily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("date_id", Tables.epochDay(col("ts")))
      .groupBy("date_id")
      .pivot("event_type", EventTypes)
      .agg(avg(col("value")))

  def build(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("date_id")
    daily(spark, dir)
      .withColumn(Target, lead(col("click"), 1).over(w))
      .na.drop("any")
  }

  /** Assembled (features vector + label + key) frame ready for MLlib. */
  def assembled(spark: SparkSession, dir: String): DataFrame =
    Models.assemble(build(spark, dir), EventTypes)
}
