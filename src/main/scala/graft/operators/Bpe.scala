package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
  * 2016) — the tokenizer face of the training-data tier.
  *
  * Scale shape (the same hybrid every production trainer uses —
  * HF tokenizers / SentencePiece train on word-frequency tables, not raw
  * text): the ONE corpus-scale pass is a Spark word-frequency
  * aggregation (map-side combined, one shuffle on the word); the merge
  * loop then runs driver-side over that Zipf-bounded table (top
  * `maxWordTable` word forms carry ≈all the mass; the truncated tail is
  * counted and surfaced, not silently dropped). Encoding broadcasts the
  * ranked merge list and runs embarrassingly parallel.
  *
  * Determinism: word table ordered (count desc, word asc); merge
  * selection ties break (count desc, pair asc); no RNG anywhere — the
  * same corpus always yields the same merges, so encoded output is
  * golden-pinnable.
  */
object Bpe {

  /** `merges` in training order (rank = position); `truncatedWords` =
    * distinct word forms beyond `maxWordTable` that did not vote.
    */
  final case class Model(merges: Vector[(String, String)],
      truncatedWords: Long) {
    /** rank lookup for greedy encoding */
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** End-of-word marker (attached to a word's last symbol) so merges
    * learned at word ends don't fire word-internally — the classic
    * formulation.
    */
  val EndMark = "</w>"

  private def wordSymbols(w: String): Vector[String] = {
    val cs = w.map(_.toString).toVector
    cs.init :+ (cs.last + EndMark)
  }

  /** Word-frequency table: lowercase alpha word forms (same tokenizer as
    * [[CorpusOps.vocabulary]]) with counts, top `maxWordTable` by
    * (count desc, word asc).
    */
  def wordTable(df: DataFrame, textCol: String,
      maxWordTable: Int): (Array[(String, Long)], Long) = {
    val counts = df.select(
        explode(filter(split(lower(col(textCol)), "[^a-z]+"),
          t => t =!= lit(""))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val total = counts.count()
    val top = counts.orderBy(col("n").desc, col("w"))
      .limit(maxWordTable)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    (top, math.max(0L, total - top.length))
  }

  /** Train `numMerges` merges. Stops early when no pair occurs twice. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWordTable: Int = 100000): Model =
    trainTrace(df, textCol, numMerges, maxWordTable)._1

  /** [[train]] plus its per-step evidence: for each merge pick,
    * `(step, left, right, pairCount)` — step 1-based, pairCount the
    * exact weighted adjacent-pair count that won the argmax under the
    * (count desc, pair asc) tie rule. These are pure integers over the
    * word table, which is what lets `q_bpe_evidence` replay the first k
    * merges in the DuckDB oracle (unrolled CTEs) and hash-compare.
    */
  def trainTrace(df: DataFrame, textCol: String, numMerges: Int,
      maxWordTable: Int = 100000)
      : (Model, Vector[(Int, String, String, Long)]) = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val (table, truncated) = wordTable(df, textCol, maxWordTable)
    var words: Array[(Vector[String], Long)] =
      table.map { case (w, n) => (wordSymbols(w), n) }
    val merges = Vector.newBuilder[(String, String)]
    val trace = Vector.newBuilder[(Int, String, String, Long)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + n)
          j += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case None => done = true
        case Some(((a, b), cnt)) =>
          merges += ((a, b))
          trace += ((i + 1, a, b, cnt))
          val merged = a + b
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

  /** Greedy encode of one word: repeatedly merge the lowest-rank adjacent
    * pair (exactly how the trained merges compose); unseen sequences fall
    * back to characters.
    */
  def encodeWord(ranks: Map[(String, String), Int], w: String): Vector[String] = {
    if (w.isEmpty) return Vector.empty
    var syms = wordSymbols(w)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) continue = false
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Encode every document: `(idCol, n_words, n_bpe_tokens, tokens)` —
    * tokens flattened in document order. Merge ranks broadcast once;
    * map-side only, no shuffle.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model.ranks)
    val enc = udf((text: String) => {
      val words = Option(text).getOrElse("").toLowerCase
        .split("[^a-z]+").filter(_.nonEmpty)
      val toks = words.flatMap(w => encodeWord(bc.value, w))
      (words.length, toks.length, toks)
    })
    df.select(col(idCol), enc(col(textCol)).as("e"))
      .select(col(idCol), col("e._1").as("n_words"),
        col("e._2").as("n_bpe_tokens"), col("e._3").as("tokens"))
  }
}
