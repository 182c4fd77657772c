package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §3.4 reconstruction — the missing feature-engineering notebooks'
  * semantics (SURVEY.md §3.4: `Lydia_Feature_Engineering.ipynb` /
  * `Rose_Preprocessing.ipynb`, attested by `Data/df_transformed.csv`,
  * `README.md:28-31` and `Presentation.pptx` slide13): price columns →
  * log-returns, pair legs → spread, per-target `lead` by its mapping lag,
  * then the NaN-tail drop that loses exactly `max(lag)+1` rows.
  *
  * The pair mapping is driver-held metadata (424 rows in the reference —
  * SURVEY.md §4.3.2); target columns are named `"<legA> - <legB>"`
  * verbatim, because that string IS the reference's public API surface
  * (`app.py:96-97` splits features from targets by it — SURVEY.md §1.2).
  */
object FeatureEngineering {

  /** One target spec from the `target_pairs` mapping: align the spread
    * `legA − legB` to `lag` periods ahead. */
  final case class PairSpec(legA: String, legB: String, lag: Int) {
    def targetName: String = s"$legA - $legB"
  }

  /** Build the modeling table from a wide price frame.
    *
    * @param wide      one row per time step, one column per instrument
    * @param timeCol   ordering ordinal (`date_id`)
    * @param priceCols instrument columns to convert to log-returns
    * @param pairs     target specs (driver metadata)
    * @param partition series key for the windows; Nil only for frames that
    *                  are provably small (e.g. day-aggregated)
    */
  def buildModelingTable(wide: DataFrame, timeCol: String, priceCols: Seq[String],
                         pairs: Seq[PairSpec],
                         partition: Seq[Column] = Nil): DataFrame = {
    val w = if (partition.isEmpty) Window.orderBy(timeCol)
            else Window.partitionBy(partition: _*).orderBy(timeCol)
    val withLr = priceCols.foldLeft(wide) { (acc, c) =>
      // nullif: a zero price must yield a null return, not an ANSI
      // DIVIDE_BY_ZERO that kills the job (same contract as
      // TimeSeries.logReturns; the NaN-tail na.drop below removes the row)
      acc.withColumn(s"lr_$c", log(col(c) / nullif(lag(col(c), 1).over(w), lit(0))))
    }
    val withTargets = pairs.foldLeft(withLr) { (acc, p) =>
      acc.withColumn(p.targetName,
        lead(col(s"lr_${p.legA}") - col(s"lr_${p.legB}"), p.lag).over(w))
    }
    val keep = priceCols.map(c => s"lr_$c") ++ pairs.map(_.targetName)
    withTargets
      .na.drop("any", keep)
      .select((timeCol +: keep).map(c => col(s"`$c`")): _*)
  }

  /** Feature/target split on the modeling table — the `" - "` name
    * predicate (`app.py:96-97`). */
  def featureTargetSplit(modeling: DataFrame): (Seq[String], Seq[String]) =
    (graft.operators.Relational.featureColumns(modeling),
      graft.operators.Relational.targetColumns(modeling))
}
