package graft

import org.apache.spark.sql.functions._

import graft.functions.{HeavyHitters, MisraGries}

/** Misra–Gries sketch + the exact two-pass composition
  * (`agg_heavy_hitters`). The load-bearing property is NO FALSE
  * NEGATIVES: every key with share > 1/(k+1) must survive the sketch
  * under any partitioning, because `exactHeavy`'s correctness rests on
  * the candidate set being a superset of the φ-heavy keys. */
class HeavyHittersSpec extends SparkSpec {

  /** 1000 rows: "heavy" 400× (40 %), "mid" 150× (15 %), 90 distinct
    * cold keys 5× each — cold cardinality ≫ k so eviction runs. */
  private def skewed = {
    val rows = Seq.fill(400)("heavy") ++ Seq.fill(150)("mid") ++
      (0 until 90).flatMap(i => Seq.fill(5)(s"cold_$i"))
    val s = spark; import s.implicits._
    // deterministic scramble so heavy rows are spread across partitions
    rows.zipWithIndex.sortBy { case (_, i) => (i * 2654435761L) % 1000003 }
      .map(_._1).toDF("k")
  }

  test("sketch never loses a key above n/(k+1), under several partitionings") {
    val mg = HeavyHitters.sketchCandidates(8) // threshold n/9 ≈ 11.1%
    for (parts <- Seq(1, 4, 13)) {
      val cand = skewed.repartition(parts)
        .agg(mg(col("k"))).head().getSeq[String](0).toSet
      assert(cand.contains("heavy") && cand.contains("mid"),
        s"parts=$parts: heavy/mid missing from candidates $cand")
      assert(cand.size <= 8, s"parts=$parts: buffer exceeded k: ${cand.size}")
    }
  }

  test("merge keeps at most k counters and respects the error bound") {
    val mg = new MisraGries(4)
    val a = Map("a" -> 10L, "b" -> 3L, "c" -> 2L, "d" -> 2L)
    val b = Map("a" -> 5L, "e" -> 6L, "f" -> 1L, "g" -> 1L)
    val m = mg.merge(a, b)
    assert(m.size <= 4)
    assert(m.contains("a") && m("a") <= 15L, s"merged: $m")
    // the (k+1)-th largest (2) was subtracted: a = 15-2 = 13, e = 6-2 = 4
    assert(m("a") == 13L && m("e") == 4L)
  }

  test("exactHeavy equals the unsketched GROUP BY + HAVING") {
    val df = skewed
    val got = HeavyHitters.exactHeavy(df, "k", phi = 0.10, k = 16)
      .select("k", "n").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = df.count()
    val want = df.groupBy("k").agg(count(lit(1)).as("n"))
      .filter(col("n") > n * 0.10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"got $got, want $want")
    assert(got == Map("heavy" -> 400L, "mid" -> 150L))
  }

  test("exactHeavy refuses a sketch too small for the threshold") {
    intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavy(skewed, "k", phi = 0.05, k = 8) // needs k+1 >= 20
    }
  }
}
