package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` exposes every implemented operator from SURVEY.md §2 on the
  * harness tables (TESTDATA.md); `oracleSql` carries the DuckDB twin for
  * each SQL-expressible one. Registries live in `graft.queries.*`, grouped
  * by SURVEY section.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The serving pipeline (SURVEY.md §3.1) — the reference's deployed
    * "Run Analysis" query: ensemble fit → point prediction → signal row. */
  def entry(spark: SparkSession): DataFrame =
    queries("serving_signal")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Rel.qs ++ graft.queries.Ts.qs ++ graft.queries.Docs.qs ++
      graft.queries.Ml.qs ++ graft.queries.Pipe.qs ++ graft.queries.Corpus.qs ++
      graft.queries.Reshape.qs ++ graft.queries.Fin.qs ++ graft.queries.Feat.qs ++
      graft.queries.R9.qs ++ graft.queries.R10.qs

  def oracleSql: Map[String, String] =
    graft.queries.Rel.sql ++ graft.queries.Ts.sql ++ graft.queries.Docs.sql ++
      graft.queries.Ml.sql ++ graft.queries.Pipe.sqlAll ++ graft.queries.Corpus.sql ++
      graft.queries.Reshape.sql ++ graft.queries.Fin.sql ++ graft.queries.Feat.sql ++
      graft.queries.R9.sql ++ graft.queries.R10.sql
}
