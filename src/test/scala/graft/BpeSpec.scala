package graft

import graft.operators.Bpe

/** Laws + hand-derived fixtures for the BPE tokenizer trainer
  * (`operators/Bpe.scala`) and its two registry queries. The trainer is
  * rows-only (an iterative merge loop has no SQL form), so these tests
  * ARE its correctness gate.
  */
class BpeSpec extends SparkSpec {

  test("train: hand-derived merges on a single-word vocabulary") {
    // "aaab" x3: pairs (a,a)=6, (a,b)=3 -> merge1 (a,a)
    // then [aa, a, b]: pairs (aa,a)=3, (a,b)=3 -> lexicographic tie-break
    // picks (a,b) -> merge2; then [aa, ab]: (aa,ab)=3 -> merge3
    val merges = Bpe.train(Seq(("aaab", 3L)), 3)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) == Seq(
      ("a", "a", 6L), ("a", "b", 3L), ("aa", "ab", 3L)))
    assert(merges.map(_.rank) == Seq(1, 2, 3))
    assert(merges.forall(m => m.merged == m.left + m.right))
  }

  test("train: the Sennrich example learns the shared suffix first") {
    // classic BPE illustration: 'est' dominates (newest 6 + widest 3 = 9)
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(vocab, 2)
    assert(merges.head.left == "e" && merges.head.right == "s" &&
      merges.head.pairCount == 9L)
    assert(merges(1).left == "es" && merges(1).right == "t" &&
      merges(1).pairCount == 9L)
  }

  test("train: stops early when no pairs remain") {
    // after merging (a,b), "ab" is a single symbol -> no adjacent pairs
    // remain, so a 10-merge budget yields exactly 1 merge
    val merges = Bpe.train(Seq(("ab", 1L)), 10)
    assert(merges.length == 1)
    assert((merges.head.left, merges.head.right) == ("a", "b"))
  }

  test("mergeWord: non-overlapping left-to-right rule") {
    assert(Bpe.mergeWord(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergeWord(Vector("a", "b", "a", "b"), "a", "b") ==
      Vector("ab", "ab"))
    assert(Bpe.mergeWord(Vector("x"), "a", "b") == Vector("x"))
  }

  test("encodeWord: concatenation invariant and merge-order priority") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(vocab, 10)
    for (w <- Seq("newest", "lowest", "wide", "low")) {
      val syms = Bpe.encodeWord(w, merges)
      assert(syms.mkString == w, "encoding must preserve the string")
      assert(syms.nonEmpty && syms.length <= w.length)
    }
  }

  test("registry: train emits a deterministic ranked table; encode compresses") {
    val dir = "/root/testdata/sf0.001"
    val t1 = SparkEntry.queries("corpus_bpe_train")(spark, dir).collect()
    val t2 = SparkEntry.queries("corpus_bpe_train")(spark, dir).collect()
    assert(t1.toSeq == t2.toSeq, "training must be run-to-run deterministic")
    assert(t1.length == 20)
    assert(t1.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    t1.foreach { m =>
      assert(m.getAs[String]("merged") ==
        m.getAs[String]("left") + m.getAs[String]("right"))
      assert(m.getAs[Long]("pair_count") > 0)
    }
    val enc = SparkEntry.queries("corpus_bpe_encode")(spark, dir).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      assert(r.getAs[Double]("syms_per_word") <= r.getAs[Double]("chars_per_word"))
      val c = r.getAs[Double]("compression")
      assert(c >= 0.0 && c < 1.0)
    }
  }
}
