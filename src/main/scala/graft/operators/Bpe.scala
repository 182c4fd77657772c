package graft.operators

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016; the
  * algorithm behind GPT-2/RoBERTa vocabularies and SentencePiece's BPE
  * mode) — the tokenizer-construction step of an LLM data pipeline.
  *
  * Scale shape (exactly how production trainers divide the work): the
  * DISTRIBUTED stage is the word-frequency count — one wordcount shuffle
  * over the corpus, after which every further pass touches only the
  * vocabulary-sized (word, count) table; the merge LOOP runs driver-side
  * over that table (HuggingFace `tokenizers`' and SentencePiece's
  * trainers hold the same table in memory — vocabulary grows sublinearly
  * with corpus size, the same driver-bound argument as the day-grain
  * model fits). Each round counts weighted adjacent symbol pairs, picks
  * the most frequent (ties broken by the lexicographic pair order, so
  * training is DETERMINISTIC), and merges its non-overlapping
  * occurrences left-to-right in every word.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, pairCount: Long)

  /** Greedy left-to-right merge of one pair inside one symbol sequence
    * (the standard BPE apply rule: occurrences cannot overlap). */
  def mergeWord(syms: Vector[String], left: String, right: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += (left + right); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Weighted adjacent-pair counts over the working vocabulary. */
  def pairCounts(vocab: Seq[(Vector[String], Long)]): Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((syms, c) <- vocab; i <- 0 until syms.length - 1) {
      val k = (syms(i), syms(i + 1))
      m(k) = m.getOrElse(k, 0L) + c
    }
    m.toMap
  }

  /** Train `nMerges` BPE merges over a word-frequency table. Words are
    * split to characters; no end-of-word marker (the corpus here is
    * already whitespace-tokenized, so merges never cross words by
    * construction). Deterministic: argmax by (count desc, pair asc). */
  def train(words: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Vector.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val counts = pairCounts(vocab)
      if (counts.isEmpty) done = true
      else {
        val ((l, rt), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += Merge(r + 1, l, rt, l + rt, c)
        vocab = vocab.map { case (syms, n) => (mergeWord(syms, l, rt), n) }
        r += 1
      }
    }
    merges.result()
  }

  /** Apply a learned merge list to one word (training-order priority —
    * the standard BPE encode). */
  def encodeWord(word: String, merges: Seq[Merge]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { (syms, m) =>
      mergeWord(syms, m.left, m.right)
    }
}
