package graft

import org.apache.spark.sql.functions._

import graft.functions.DotProductExpr
import graft.plans.GraftExtensions

class PlansSpec extends SparkSpec {

  test("register exposes graft kernels to plain SQL") {
    GraftExtensions.register(spark)
    val s = spark; import s.implicits._
    Seq(("alpha beta gamma", 1L)).toDF("text", "id").createOrReplaceTempView("pl_docs")
    val r = spark.sql(
      """SELECT graft_simhash(graft_token_hashes(text)) AS sh,
        |       graft_fingerprint(graft_token_hashes(text)) AS fp,
        |       graft_ascii_checksum(text) AS cs,
        |       graft_minhash_sig(graft_shingle_hashes(text), 4) AS sig,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot
        |FROM pl_docs""".stripMargin).head()
    assert(r.getAs[Long]("sh") >= 0)
    assert(r.getSeq[Long](r.fieldIndex("sig")).size == 4)
    assert(approx(r.getAs[Double]("dot"), 11.0))
    // SQL result == Column-API result
    val viaApi = Seq(("alpha beta gamma", 1L)).toDF("text", "id")
      .select(graft.functions.Text.fingerprint(
        graft.functions.Text.tokenHashes(col("text")))).head().getLong(0)
    assert(r.getAs[Long]("fp") == viaApi)
  }

  test("VectorizeHofRule rewrites the HOF dot-product idiom to the kernel") {
    GraftExtensions.register(spark)
    val s = spark; import s.implicits._
    // parquet-backed source: a LocalRelation would be constant-folded away
    // before the optimizer batch that runs extra rules
    val dir = java.nio.file.Files.createTempDirectory("graft-vec").toString
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .write.mode("overwrite").parquet(s"$dir/t")
    val d = spark.read.parquet(s"$dir/t")
    val q = d.select(
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)").as("dot"))
    val optimized = q.queryExecution.optimizedPlan
    val rewritten = optimized.expressions.exists(_.exists(_.isInstanceOf[DotProductExpr]))
    assert(rewritten, s"kernel not found in: $optimized")
    assert(approx(q.head().getDouble(0), 4.0 + 10.0 + 18.0))
  }

  test("rule leaves non-matching folds alone") {
    GraftExtensions.register(spark)
    val s = spark; import s.implicits._
    val d = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    // sum fold (no zip_with product) must not be rewritten
    val q = d.select(expr("aggregate(a, 0d, (acc, v) -> acc + v)").as("s"))
    assert(!q.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProductExpr])))
    assert(approx(q.head().getDouble(0), 3.0))
  }
}
