package graft

/** Structural audit of every registered query's physical plan at
  * sf0.001 — the automated version of the "would this survive 100 TB"
  * plan review: no accidental cartesian products, nested-loop joins only
  * where a driver-sized side is broadcast BY DESIGN, and the lake scans
  * keep their filter pushdown.
  *
  * Queries run real driver-side work while BUILDING their DataFrame
  * (adaptive cleaning steps, MLlib fits), so this suite costs one
  * sf0.001 pass — but it asserts on the PLAN, which is what code review
  * cannot re-check on every commit.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Ops whose plans legitimately contain a broadcast nested-loop join:
    * a deliberately-broadcast driver-sized side (1-row min/max cut
    * frames, the query set of the brute-force baseline, ±1-row
    * validation lookups). */
  private val nestedLoopByDesign = Set(
    "agg_histogram", "bin_deciles", "similarity_topk_bruteforce",
    "dedup_embedding_cosine", "last_row_lookup", "ewma_halflife",
    "outlier_iqr_clip",
    "ml_metric_r2",    // crossJoin(broadcast(1-row avg(y)))
    "text_tfidf_topk") // crossJoin(broadcast(1-row corpus count))

  private lazy val plans: Map[String, String] = {
    graft.plans.GraftExtensions.register(spark)
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, dir).queryExecution.executedPlan.toString
    }.toMap
  }

  test("no query plan contains a cartesian product") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("nested-loop joins appear only where a side is broadcast by design") {
    val offenders = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin")
        && !nestedLoopByDesign(n) => n }
    assert(offenders.isEmpty, s"unexpected nested-loop joins in: $offenders")
  }

  test("parquet scans under a filter keep pushdown (representative query)") {
    val p = plans("filter_gt")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"no pushed filters in filter_gt plan:\n$p")
  }

  test("equi-joins against driver-sized dimensions broadcast (representative query)") {
    assert(plans("join_mapping_left").contains("BroadcastHashJoin"),
      "join_mapping_left should broadcast the pairs side")
  }
}
