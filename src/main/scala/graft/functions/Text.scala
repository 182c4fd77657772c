package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._

/** Text-analysis functions for the large-scale training-data pipeline
  * (BASELINE north star; no reference analog — the reference is
  * numeric-only).
  *
  * The hash/signature kernels are native Catalyst expressions
  * ([[HashExprs]]) — codegen'd tight loops; see HashImpl's scaladoc for
  * why the higher-order-function formulation was replaced. The cheap
  * token statistics stay as built-in higher-order compositions. Every
  * formula has an exact ANSI-SQL twin in `graft.queries.Docs` so the
  * DuckDB oracle checks them cell-for-cell (constants: Knuth multiplier
  * 2654435761, modulus P = 1e9+7).
  */
object Text {

  val P: Long = HashImpl.P

  private def ec(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)

  private def ex(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(c)

  /** Token-hash array straight from the text column. */
  def tokenHashes(text: Column): Column = ec(TokenHashesExpr(ex(text)))

  /** Clamped 3-word shingle hashes straight from the text column. */
  def shingleHashes(text: Column): Column = ec(ShingleHashesExpr(ex(text)))

  /** `text_simhash`: 64-bit SimHash over a token-hash array column. */
  def simhash(hashes: Column): Column = ec(SimHashExpr(ex(hashes)))

  /** MinHash signature (numHashes permutations) over shingle hashes. */
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    ec(MinHashSigExpr(ex(hashes), numHashes))

  /** `doc_fingerprint`: order-sensitive rolling hash over token hashes. */
  def fingerprint(hashes: Column): Column = ec(FingerprintExpr(ex(hashes)))

  /** Code-point checksum (multimodal decode stub twin). */
  def asciiChecksum(text: Column): Column = ec(AsciiChecksumExpr(ex(text)))

  // ---- token statistics (cheap, stay declarative) ----------------------

  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")

  def meanTokenLen(toksCol: String): Column =
    expr(s"aggregate(transform($toksCol, t -> length(t)), 0L, (acc, x) -> acc + x)")
      .cast("double") / size(col(toksCol))

  def stopwordRatio(toksCol: String): Column = {
    val list = stopwords.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter($toksCol, t -> t IN ($list)))").cast("double") / size(col(toksCol))
  }

  /** Language-ID marker sets — a marker-word heuristic: score each
    * language by its marker-token count, argmax wins (ties break to the
    * alphabetically-first code via the CASE order in the caller). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "fast", "slow"),
    "es" -> Seq("datos", "tabla", "fila", "consulta", "rapido"),
    "zh" -> Seq("shuju", "biao", "hang", "chaxun", "kuai"))

  def langScore(toksCol: String, markers: Seq[String]): Column = {
    val list = markers.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter($toksCol, t -> t IN ($list)))")
  }
}
