package graft.operators

import org.apache.spark.sql.DataFrame

/** WordPiece tokenizer training + encoding (Schuster & Nakajima 2012;
  * the BERT tokenizer) — the third tokenizer family beside [[Bpe]] and
  * [[UnigramLm]]. Where BPE merges the most FREQUENT adjacent pair,
  * WordPiece merges the pair maximizing the likelihood ratio
  * `count(ab) / (count(a) · count(b))` — frequent-but-expected pairs
  * lose to rare-but-predictive ones.
  *
  * Scale shape: identical to [[Bpe]] — the ONE corpus-scale pass is
  * the word-frequency aggregation ([[Bpe.wordTable]], map-side
  * combined, one shuffle); the merge loop runs driver-side over the
  * Zipf-bounded table; encoding broadcasts the vocabulary and is
  * embarrassingly parallel.
  *
  * Determinism + oracle parity: the likelihood argmax is computed on
  * the QUANTIZED integer score `(pairCount << 40) div (cntA · cntB)`
  * (BigInt, exact — the [[Stratified]] PPS-key quantization trick),
  * ties broken (pair asc), so a relational engine computes the
  * identical winner with HUGEINT arithmetic — no float ratio whose ulp
  * could flip a pick. Continuation symbols carry the standard `##`
  * prefix; a merge concatenates the left symbol with the right's
  * unprefixed text.
  */
object WordPiece {

  val ContMark = "##"

  /** Quantization shift for the likelihood score (see object doc). */
  val ScoreShift = 40

  final case class Model(merges: Vector[(String, String)],
      truncatedWords: Long) {
    /** Final vocabulary: all symbols present after applying the merges
      * is encoder state; for greedy encoding only the merged symbol
      * set matters.
      */
    lazy val vocab: Set[String] =
      merges.map { case (a, b) => a + b.stripPrefix(ContMark) }.toSet
  }

  private def wordSymbols(w: String): Vector[String] =
    w.head.toString +: w.tail.map(c => ContMark + c).toVector

  /** Train `numMerges` merges; stops early when no pair occurs twice.
    * Returns the model plus per-step evidence
    * `(step, left, right, pairCount, leftCount, rightCount)` — all
    * exact weighted integers over the word table, which is what lets
    * `q_wordpiece_evidence` replay the picks in the DuckDB oracle.
    */
  def trainTrace(df: DataFrame, textCol: String, numMerges: Int,
      maxWordTable: Int = 100000)
      : (Model, Vector[(Int, String, String, Long, Long, Long)]) = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val (table, truncated) = Bpe.wordTable(df, textCol, maxWordTable)
    var words: Array[(Vector[String], Long)] =
      table.map { case (w, n) => (wordSymbols(w), n) }
    val merges = Vector.newBuilder[(String, String)]
    val trace = Vector.newBuilder[(Int, String, String, Long, Long, Long)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length) {
          symCounts.update(syms(j), symCounts.getOrElse(syms(j), 0L) + n)
          if (j < syms.length - 1) {
            val k = (syms(j), syms(j + 1))
            pairCounts.update(k, pairCounts.getOrElse(k, 0L) + n)
          }
          j += 1
        }
      }
      val best = pairCounts.iterator
        .filter(_._2 >= 2)
        .map { case ((a, b), cnt) =>
          val q = (BigInt(cnt) << ScoreShift) /
            (BigInt(symCounts(a)) * symCounts(b))
          ((a, b), cnt, q)
        }
        .toSeq
        .sortBy { case ((a, b), _, q) => (-q, a, b) }
        .headOption
      best match {
        case None => done = true
        case Some(((a, b), cnt, _)) =>
          merges += ((a, b))
          trace += ((i + 1, a, b, cnt, symCounts(a), symCounts(b)))
          val merged = a + b.stripPrefix(ContMark)
          words = words.map { case (syms, n) =>
            if (syms.length < 2) (syms, n)
            else {
              val out = Vector.newBuilder[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                  out += merged; j += 2
                } else { out += syms(j); j += 1 }
              }
              (out.result(), n)
            }
          }
      }
      i += 1
    }
    (Model(merges.result(), truncated), trace.result())
  }

  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWordTable: Int = 100000): Model =
    trainTrace(df, textCol, numMerges, maxWordTable)._1

  /** Greedy longest-match-first encoding of one word (the standard
    * WordPiece inference rule, NOT merge-order replay): repeatedly take
    * the longest prefix of the remainder that is a known piece
    * (single characters always are). Continuation pieces carry `##`.
    */
  def encodeWord(model: Model, w: String): Vector[String] = {
    if (w.isEmpty) return Vector.empty
    val pieces = Vector.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      val prefix = if (pos == 0) "" else ContMark
      var end = w.length
      var found = -1
      while (end > pos && found < 0) {
        val cand = prefix + w.substring(pos, end)
        if (end - pos == 1 || model.vocab.contains(cand)) found = end
        else end -= 1
      }
      pieces += (prefix + w.substring(pos, found))
      pos = found
    }
    pieces.result()
  }
}
