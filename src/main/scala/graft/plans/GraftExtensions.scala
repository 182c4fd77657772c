package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Catalyst integration: registers the graft kernels as SQL functions and
  * installs the [[VectorizeHofRule]] optimizer rewrite.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    (the production path for a cluster);
  *  - [[GraftExtensions.register]]`(spark)` for an existing session (the
  *    harness path — Verify/Bench call it, idempotent).
  *
  * After registration the kernels are usable from plain SQL:
  * `SELECT graft_simhash(graft_token_hashes(text)) FROM docs`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => VectorizeHofRule)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def one(args: Seq[Expression], name: String)(f: Expression => Expression): Expression = {
    require(args.size == 1, s"$name expects 1 argument")
    f(args.head)
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_token_hashes",
      info("graft_token_hashes", "token-hash array of a whitespace-tokenized string"),
      (args: Seq[Expression]) => one(args, "graft_token_hashes")(TokenHashesExpr)),
    ("graft_shingle_hashes",
      info("graft_shingle_hashes", "clamped 3-word shingle hashes of a string"),
      (args: Seq[Expression]) => one(args, "graft_shingle_hashes")(ShingleHashesExpr)),
    ("graft_simhash",
      info("graft_simhash", "64-bit SimHash of an array<long> of token hashes"),
      (args: Seq[Expression]) => one(args, "graft_simhash")(SimHashExpr)),
    ("graft_fingerprint",
      info("graft_fingerprint", "rolling fingerprint of an array<long> of token hashes"),
      (args: Seq[Expression]) => one(args, "graft_fingerprint")(FingerprintExpr)),
    ("graft_ascii_checksum",
      info("graft_ascii_checksum", "sum of code points of a string"),
      (args: Seq[Expression]) => one(args, "graft_ascii_checksum")(AsciiChecksumExpr)),
    ("graft_minhash_sig",
      info("graft_minhash_sig", "MinHash signature (arg2 = numHashes literal)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_minhash_sig expects (hashes, numHashes)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Int]
        }
        MinHashSigExpr(args.head, k)
      }),
    ("graft_dot",
      info("graft_dot", "sequential-fold dot product of two array<double>"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_dot expects (a, b)")
        DotProductExpr(args(0), args(1))
      }),
  )

  /** Idempotent registration on a live session (harness path). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, inf, builder) =>
      registry.registerFunction(FunctionIdentifier(name), inf, builder)
    }
    val opt = spark.sessionState.experimentalMethods
    if (!opt.extraOptimizations.contains(VectorizeHofRule)) {
      opt.extraOptimizations = opt.extraOptimizations :+ VectorizeHofRule
    }
  }
}
