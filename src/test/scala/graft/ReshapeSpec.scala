package graft

import org.apache.spark.sql.functions._

/** Reshaping queries (`queries.Reshape`): pivot/melt inversion, crosstab
  * marginals, by-name concat null-fill, value_counts normalization, and
  * the exact running-sum law — all on sf0.001. */
class ReshapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("unpivot_melt inverts pivot_wide (same cells, long form)") {
    val wide = graft.queries.Reshape.qs("pivot_wide")(spark, dir)
    val long = graft.queries.Reshape.qs("unpivot_melt")(spark, dir)
    val n = wide.count()
    assert(long.count() == n * graft.ml.ModelingFrame.EventTypes.size)
    // spot-law: every (date_id, variable) cell in the melt equals the
    // wide frame's column value (join back and compare, null-safe)
    val joined = graft.ml.ModelingFrame.EventTypes.map { v =>
      wide.select(col("date_id"), round(col(v), 6).as("w"))
        .join(long.filter(col("variable") === v), "date_id")
        .filter(!(col("w") <=> col("value")))
        .count()
    }
    assert(joined.sum == 0L)
  }

  test("crosstab_freq marginals equal the plain group counts") {
    val ct = graft.queries.Reshape.qs("crosstab_freq")(spark, dir)
    val rowSums = ct.select(col("event_type"),
      (1 to 7).map(i => col(s"dow_$i")).reduce(_ + _).as("n"))
    val plain = Tables.events(spark, dir).groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    assert(rowSums.join(plain, Seq("event_type", "n")).count() == plain.count())
  }

  test("concat_union_by_name null-fills the absent side and loses no rows") {
    val out = graft.queries.Reshape.qs("concat_union_by_name")(spark, dir)
    val orders = Tables.orders(spark, dir)
    val nF = orders.filter(col("o_orderstatus") === "F").count()
    val nO = orders.filter(col("o_orderstatus") === "O").count()
    assert(out.count() == nF + nO)
    assert(out.filter(col("o_totalprice").isNotNull).count() == nF)
    assert(out.filter(col("o_orderpriority").isNotNull).count() == nO)
    assert(out.filter(col("o_totalprice").isNotNull &&
      col("o_orderpriority").isNotNull).count() == 0)
  }

  test("value_counts shares sum to ~1 and counts to the table size") {
    val vc = graft.queries.Reshape.qs("value_counts")(spark, dir).collect()
    val total = Tables.events(spark, dir).count()
    assert(vc.map(_.getAs[Long]("n")).sum == total)
    assert(approx(vc.map(_.getAs[Double]("pct")).sum, 1.0, 1e-4))
  }

  test("json extraction: typed from_json agrees with get_json_object, groups cover all rows") {
    val ev = Tables.events(spark, dir)
    val both = ev.select(
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k").as("a"),
      get_json_object(col("props"), "$.k").cast("long").as("b"))
    assert(both.filter(!(col("a") <=> col("b"))).count() == 0)
    val grouped = graft.queries.Reshape.qs("json_groupby_extracted")(spark, dir)
    assert(grouped.agg(sum("n")).head().getLong(0) == ev.count())
  }

  test("ts_cumulative: final running values equal the per-series aggregates") {
    val cum = graft.queries.Reshape.qs("ts_cumulative")(spark, dir)
    val ev = Tables.events(spark, dir)
    // last event per user carries the full-series sum/max/count
    val lastIds = ev.groupBy("user_id").agg(max("event_id").as("event_id"))
    val finals = cum.join(lastIds, "event_id")
    val expect = ev.groupBy("user_id").agg(
      sum(col("value").cast("decimal(18,2)")).cast("double").as("cum_sum"),
      max("value").as("cum_max"),
      count(lit(1)).as("cum_n"))
    val mismatched = finals.join(expect, "user_id")
      .filter(!(finals("cum_sum") <=> expect("cum_sum")) ||
        !(finals("cum_max") <=> expect("cum_max")) ||
        !(finals("cum_n") <=> expect("cum_n")))
    assert(mismatched.count() == 0)
  }
}
