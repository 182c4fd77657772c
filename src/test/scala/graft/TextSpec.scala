package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

case class Txt(id: Long, text: String)

class TextSpec extends SparkSpec {

  private def one(text: String) = {
    df(Seq(Txt(1, text))).withColumn("toks", split(col("text"), " "))
  }

  test("meanTokenLen and stopwordRatio") {
    val out = one("the cat sat")
      .select(Text.meanTokenLen("toks").as("mtl"), Text.stopwordRatio("toks").as("sr"))
      .head()
    assert(approx(out.getDouble(0), (3 + 3 + 3) / 3.0))
    assert(approx(out.getDouble(1), 1.0 / 3.0))
  }

  test("fingerprint is order-sensitive and deterministic") {
    def fp(t: String): Long =
      one(t).withColumn("th", Text.tokenHashes("toks"))
        .select(Text.fingerprint("th")).head().getLong(0)
    assert(fp("alpha beta gamma") == fp("alpha beta gamma"))
    assert(fp("alpha beta gamma") != fp("gamma beta alpha"))
  }

  test("simhash of identical token multisets is identical") {
    def sh(t: String): Long =
      one(t).withColumn("th", Text.tokenHashes("toks"))
        .select(Text.simhash("th")).head().getLong(0)
    assert(sh("a b c d") == sh("a b c d"))
    // 32-bit range
    assert(sh("a b c d e f g") >= 0 && sh("a b c d e f g") < (1L << 32))
  }

  test("minhash signature length and identical-text collision") {
    def sig(t: String): Seq[Long] =
      one(t).withColumn("sh", Text.shingleHashes("toks"))
        .select(Text.minhashSignature("sh", 16)).head().getSeq[Long](0)
    val s1 = sig(Seq.fill(3)("w1 w2 w3 w4 w5").mkString(" "))
    assert(s1.size == 16)
    assert(s1 == sig(Seq.fill(3)("w1 w2 w3 w4 w5").mkString(" ")))
  }

  test("minhash estimates Jaccard: equal sets agree on every component") {
    val a = "one two three four five six seven eight nine ten"
    def sig(t: String): Seq[Long] =
      one(t).withColumn("sh", Text.shingleHashes("toks"))
        .select(Text.minhashSignature("sh", 16)).head().getSeq[Long](0)
    assert(sig(a) == sig(a))
    // disjoint shingle sets should NOT agree everywhere
    val b = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert(sig(a) != sig(b))
  }

  test("langScore counts marker tokens") {
    val out = one("the datos the shuju")
      .select(Text.langScore("toks", Text.langMarkers.toMap.apply("en")).as("en"),
        Text.langScore("toks", Text.langMarkers.toMap.apply("es")).as("es"))
      .head()
    assert(out.getInt(0) == 2 && out.getInt(1) == 1)
  }
}
