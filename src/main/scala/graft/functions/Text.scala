package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for the large-scale training-data
  * pipeline (BASELINE north star; no reference analog — the reference is
  * numeric-only). All are pure Catalyst expression trees over built-ins
  * (split / higher-order transform / aggregate) — codegen'd, no UDFs, no
  * serialization penalty — and every formula has an exact ANSI-SQL twin in
  * `graft.queries.Docs` so the DuckDB oracle checks them cell-for-cell.
  *
  * API shape: the per-row intermediate arrays (tokens, token hashes,
  * shingle hashes) are materialized ONCE into columns by `withTokens` /
  * `withTokenHashes` / `withShingleHashes`, and the signature functions
  * consume those columns. Recomputing `split()` inside every lambda would
  * multiply the scan cost by the signature width — visible at 100 TB.
  *
  * Hash constants: Knuth multiplier 2654435761, modulus P = 1e9+7. The
  * hashes are intentionally cheap char-sampling polynomials: collisions
  * only make MinHash/SimHash slightly more approximate, and cheapness
  * keeps the whole signature computation inside whole-stage codegen.
  */
object Text {

  val P: Long = 1000000007L

  /** Cheap deterministic string hash:
    * (len*2654435761 + 97*ascii(first) + ascii(mid) + ascii(last)) mod P. */
  def strHashSql(t: String): String =
    s"(length($t) * 2654435761L + ascii(substring($t, 1, 1)) * 97 + " +
      s"ascii(substring($t, 1 + length($t) div 2, 1)) * 31 + " +
      s"ascii(substring($t, length($t), 1))) % ${P}L"

  /** Whitespace tokenizer → `outCol: array<string>`. */
  def withTokens(textCol: String, outCol: String): Column = split(col(textCol), " ")

  /** Token-hash array over a token column. */
  def tokenHashes(toksCol: String): Column =
    expr(s"transform($toksCol, t -> ${strHashSql("t")})")

  /** 3-word shingle hashes over a token column (texts shorter than 3
    * tokens degenerate to one clamped shingle — mirrored in the SQL twin). */
  def shingleHashes(toksCol: String): Column =
    expr(s"""
      transform(
        transform(
          sequence(1, greatest(size($toksCol) - 2, 1)),
          i -> concat_ws(' ',
            element_at($toksCol, i),
            element_at($toksCol, least(i + 1, size($toksCol))),
            element_at($toksCol, least(i + 2, size($toksCol))))),
        s -> ${strHashSql("s")})""")

  // ---- text statistics --------------------------------------------------

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
    * alphabetically-first code via strict `>` in the CASE chain). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "fast", "slow"),
    "es" -> Seq("datos", "tabla", "fila", "consulta", "rapido"),
    "zh" -> Seq("shuju", "biao", "hang", "chaxun", "kuai"))

  def langScore(toksCol: String, markers: Seq[String]): Column = {
    val list = markers.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter($toksCol, t -> t IN ($list)))")
  }

  /** `doc_fingerprint`: order-sensitive rolling hash over token hashes —
    * fp = fold(acc*31 + h) mod P. Two texts share a fingerprint iff their
    * full token sequences collide (content-defined identity). */
  def fingerprint(hashesCol: String): Column =
    expr(s"aggregate($hashesCol, 0L, (acc, h) -> (acc * 31 + h) % ${P}L)")

  /** `text_simhash`: 32-bit SimHash over a token-hash column. Bit b is the
    * sign of the per-bit vote sum (+1 if the hash has bit b set, −1
    * otherwise); near-identical token multisets give near-identical
    * signatures. One pass per bit over the precomputed hash array. */
  def simhash(hashesCol: String): Column =
    expr(s"""
      aggregate(
        sequence(0, 31),
        0L,
        (acc, b) -> acc + IF(
          aggregate($hashesCol, 0L, (v, h) -> v + (shiftright(h, b) & 1) * 2 - 1) > 0,
          shiftleft(1L, b), 0L))""")

  /** MinHash signature over a shingle-hash column: numHashes permutations
    * h_i(x) = ((2i+1)x + 7919i) mod P, min per permutation → array<long>. */
  def minhashSignature(shinglesCol: String, numHashes: Int): Column =
    expr(s"""
      transform(
        sequence(0, ${numHashes - 1}),
        i -> array_min(transform($shinglesCol, h -> ((2 * i + 1) * h + 7919 * i) % ${P}L)))""")
}
