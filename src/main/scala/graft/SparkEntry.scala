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

  /** Rows-only entries whose output hash is deterministic per host but
    * NOT across hosts: seeded MLlib training (KMeans‖ init, online-VB
    * LDA, IVF's Lloyd quantizer) reduces floats in partition/thread
    * order, which a host change can legally permute. The r10 driver
    * re-run changed exactly these three engine hashes vs the builder's
    * committed run. Verify stamps them `"determinism": "same-host"` in
    * the hash artifacts so the stability claim carries its scope; the
    * CROSS-host deterministic guarantee for these families lives in the
    * hash-checked twins (`ml_kmeans_lloyd`, `similarity_ivf_probe`,
    * `ml_gmm_em`). None has a DuckDB oracle, so the driver gate is
    * unaffected either way. */
  def sameHostDeterministic(name: String): Boolean =
    Set("ml_kmeans", "ml_lda_topics", "similarity_ivf").contains(name)

  /** Rows-only entries whose engine hash is deterministic across ANY
    * physical layout, not merely per host (r15, VERDICT r14 ask #4):
    * the ensemble family's forest is content-seeded (`graft.ml.Forest`:
    * splitmix64(seed, tree, row-content-hash) bootstrap multiplicities
    * over hash-canonicalized rows), so repartitioning or reordering the
    * training frame cannot move a bit — ForestSpec pins 1-vs-7-partition
    * and shuffled-row bit-equality end to end, and GoldenParitySpec pins
    * the quality band on the reference CSV. `ml_ensemble_weighted`'s
    * r2/mae rows are additionally pinned to the DRIVER-REPLAY path
    * regardless of intra-session query order: `Ensemble.report` matches
    * the fit's semantic key (dir, label, grain, numTrees) stamped by
    * `fittedCached`, so a cache hit from an earlier query can never
    * demote the metrics to the partition-order-dependent distributed
    * fold (ADVICE r15). Verify stamps these
    * `"determinism": "cross-layout"` so the guarantee is visible in the
    * gate artifacts. */
  def crossLayoutDeterministic(name: String): Boolean =
    Set("ml_ensemble_weighted", "serving_signal", "ml_random_forest")
      .contains(name)
}
