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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("join_xy_inner")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Rel.qs ++ graft.queries.Ts.qs ++ graft.queries.Docs.qs

  def oracleSql: Map[String, String] =
    graft.queries.Rel.sql ++ graft.queries.Ts.sql ++ graft.queries.Docs.sql
}
