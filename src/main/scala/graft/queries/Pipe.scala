package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.ModelingFrame
import graft.pipelines.Reference

/** End-to-end pipeline queries (SURVEY.md §3 entry points). Rows-only
  * checks: the pipelines' constituent operators are each oracle-checked
  * individually; the composition result is validated by ScalaTest
  * postconditions (schema, row count, no-null assertions).
  */
object Pipe {

  type Q = (SparkSession, String) => DataFrame

  val qs: Map[String, Q] = Map(
    /** §3.1 serving query — THE flagship (one-row signal record). */
    "serving_signal" -> ((s, d) => Reference.servingSignal(s, d)),

    /** §3.2 cleaning spine on the daily wide frame with deterministic
      * null injection (sparse col ~70% null → dropped; moderate ~20% →
      * imputed). */
    "cleaning_pipeline" -> ((s, d) => {
      val wide = ModelingFrame.daily(s, d)
        .withColumn("sparse_feat",
          when(col("date_id") % 10 < 7, lit(null).cast("double")).otherwise(col("error")))
        .withColumn("click",
          when(col("date_id") % 5 === 2, lit(null).cast("double")).otherwise(col("click")))
      Reference.cleaningPipeline(wide, "date_id",
          featureCols = ModelingFrame.EventTypes :+ "sparse_feat",
          targetCols = ModelingFrame.EventTypes,
          maxNullPct = 50.0, topK = 2, leadDays = 1)
        .orderBy("date_id")
    }),
  )

  val sql: Map[String, String] = Map.empty
}
