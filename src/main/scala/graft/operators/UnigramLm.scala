package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, the SentencePiece `unigram` model) —
  * the second real-world LLM tokenizer algorithm beside [[Bpe]]: instead
  * of greedy merges, hold a piece vocabulary with log-probabilities and
  * segment each word by the MAXIMUM-LIKELIHOOD split (Viterbi over the
  * word's substring lattice). Training alternates segmentation and
  * re-estimation (hard/Viterbi EM) and prunes to the target vocabulary.
  *
  * Scale shape — identical to [[Bpe]] (and to how SentencePiece itself
  * trains): the ONE corpus-scale pass is the word-frequency aggregation
  * ([[Bpe.wordTable]], map-side combined, one shuffle on the word); the
  * EM loop runs driver-side over the Zipf-bounded table (truncated tail
  * counted and surfaced, never silently dropped); encoding broadcasts the
  * piece table and runs embarrassingly parallel, no shuffle.
  *
  * Determinism (golden-pinnable): seeding ranks substrings by
  * (score desc, piece asc); pruning keeps top pieces by (count desc,
  * piece asc) and ALWAYS retains single characters (coverage: every word
  * segments, round-trip concatenation is lossless — spec-pinned);
  * Viterbi ties break toward FEWER pieces, then the lexicographically
  * smaller piece sequence. No RNG anywhere.
  */
object UnigramLm {

  /** `logProbs`: piece → ln(count/total) after the final M-step;
    * `truncatedWords`: word forms beyond the table cap that did not vote.
    */
  final case class Model(logProbs: Map[String, Double], truncatedWords: Long)

  /** Maximum-likelihood segmentation of `w` under `logProbs` — Viterbi
    * over the substring lattice, O(len × maxPieceLen). Ties prefer fewer
    * pieces, then the lexicographically smaller sequence (exact,
    * engine-independent tie order).
    */
  def viterbi(logProbs: Map[String, Double], w: String,
      maxPieceLen: Int = 16): Vector[String] = {
    val n = w.length
    if (n == 0) return Vector.empty
    // best(i): (score, nPieces, pieces) for prefix w[0, i)
    val bestScore = Array.fill(n + 1)(Double.NegativeInfinity)
    val bestLen = Array.fill(n + 1)(Int.MaxValue)
    val bestSeq = Array.fill[List[String]](n + 1)(Nil)
    bestScore(0) = 0.0; bestLen(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = w.substring(j, i)
        logProbs.get(piece) match {
          case Some(lp) if bestScore(j) != Double.NegativeInfinity =>
            val s = bestScore(j) + lp
            val l = bestLen(j) + 1
            val cand = piece :: bestSeq(j)
            val better = s > bestScore(i) ||
              (s == bestScore(i) && (l < bestLen(i) ||
                (l == bestLen(i) && seqLt(cand, bestSeq(i)))))
            if (better) { bestScore(i) = s; bestLen(i) = l; bestSeq(i) = cand }
          case _ =>
        }
        j += 1
      }
      i += 1
    }
    bestSeq(n).reverse.toVector
  }

  /** Lexicographic order on REVERSED piece stacks (head = last piece):
    * compare as the forward sequences they represent.
    */
  private def seqLt(a: List[String], b: List[String]): Boolean = {
    val av = a.reverse; val bv = b.reverse
    val it = av.iterator.zip(bv.iterator)
    while (it.hasNext) {
      val (x, y) = it.next()
      if (x != y) return x < y
    }
    av.length < bv.length
  }

  /** Train on the corpus word table: seed with the highest-mass
    * substrings (score = freq × len, the standard seeding heuristic) plus
    * all single characters, run `emIters` rounds of Viterbi-EM, prune to
    * `vocabSize` keeping single chars unconditionally.
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 8, emIters: Int = 3,
      seedFactor: Int = 4, maxWordTable: Int = 100000): Model = {
    require(vocabSize > 0 && emIters >= 1)
    val (table, truncated) = Bpe.wordTable(df, textCol, maxWordTable)
    val chars: Set[String] =
      table.iterator.flatMap(_._1.map(_.toString)).toSet
    // seed: substring mass
    val subScore = scala.collection.mutable.HashMap.empty[String, Long]
    table.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var l = 2
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          subScore.update(p, subScore.getOrElse(p, 0L) + n * l)
          l += 1
        }
        i += 1
      }
    }
    val seeded = subScore.toSeq.sortBy { case (p, s) => (-s, p) }
      .take(math.max(0, vocabSize * seedFactor - chars.size))
      .map(_._1)
    var vocab: Set[String] = chars ++ seeded
    // uniform init (any constant: first E-step then ranks by piece count)
    var logProbs: Map[String, Double] =
      vocab.iterator.map(p => p -> 0.0).toMap
    var iter = 0
    while (iter < emIters) {
      // E: Viterbi counts under current probs
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      table.foreach { case (w, n) =>
        viterbi(logProbs, w, maxPieceLen).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + n)
        }
      }
      // prune toward vocabSize (chars immune — coverage invariant)
      val keepMulti = counts.iterator.filter(kv => kv._1.length > 1)
        .toSeq.sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - chars.size)).map(_._1).toSet
      vocab = chars ++ keepMulti
      // M: renormalize over kept pieces (chars never zero out: floor 1)
      val kept = vocab.iterator
        .map(p => p -> math.max(counts.getOrElse(p, 0L), if (p.length == 1) 1L else 0L))
        .filter(_._2 > 0L).toSeq
      val total = kept.iterator.map(_._2).sum.toDouble
      logProbs = kept.iterator
        .map { case (p, c) => p -> math.log(c / total) }.toMap
      iter += 1
    }
    Model(logProbs, truncated)
  }

  /** Seed-phase sufficient statistics of [[train]] as a fully relational
    * Spark job — no driver loop at all: the word table (top
    * `maxWordTable` by (count desc, word asc)), every substring of
    * length 2..`maxPieceLen` with its exact integer mass
    * `sum(wordCount × pieceLen)` (the seeding score at line ~104), and
    * the (score desc, piece asc) rank, truncated to the seed budget
    * `vocabSize × seedFactor − |charInventory|` exactly as the trainer
    * takes it. Output `(seed_rank, piece, score)` — all integers/strings, so
    * the whole corpus-scale pass of the unigram tokenizer hash-compares
    * against a DuckDB oracle (`q_unigram_evidence`); the EM refinement
    * on top stays spec-gated (UnigramLmSpec) + golden-pinned.
    */
  def seedEvidence(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 8, seedFactor: Int = 4,
      maxWordTable: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(
        explode(filter(split(lower(col(textCol)), "[^a-z]+"),
          t => t =!= lit(""))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val wt = counts.orderBy(col("n").desc, col("w")).limit(maxWordTable)
    // char inventory size — one scalar (dim-bounded: ≤26 for the alpha
    // tokenizer), the same class of driver value as a broadcast constant
    val nChars = wt.select(explode(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("c"))
      .agg(countDistinct(col("c"))).head().getLong(0)
    val budget = math.max(0L, vocabSize.toLong * seedFactor - nChars)
    // all substrings of length 2..maxPieceLen: slice a fixed length list
    // so the degenerate sequence(2, 1) auto-reverse never fires
    val subs = wt.select(col("n"), explode(expr(
      s"""flatten(transform(sequence(1, length(w)), i ->
         |  transform(
         |    slice(sequence(2, $maxPieceLen), 1,
         |      greatest(0, least($maxPieceLen, length(w) - i + 1) - 1)),
         |    l -> struct(substring(w, i, l) AS p, l AS l))))""".stripMargin))
      .as("s"))
    // top-k FIRST (TakeOrderedAndProject — per-partition heaps, no full
    // sort), then rank only the budget-bounded survivors
    val rankW = Window.orderBy(col("score").desc, col("piece"))
    subs.select(col("s.p").as("piece"),
        (col("n") * col("s.l").cast("long")).as("mass"))
      .groupBy("piece").agg(sum(col("mass")).as("score"))
      .orderBy(col("score").desc, col("piece")).limit(budget.toInt)
      .withColumn("seed_rank", row_number().over(rankW).cast("long"))
      .select(col("seed_rank"), col("piece"), col("score"))
      .orderBy("seed_rank")
  }

  /** Encode every document: `(idCol, n_words, n_pieces, tokens)` — the
    * [[Bpe.encode]] contract with Viterbi segmentation. Piece table
    * broadcast once; map-side only, no shuffle.
    */
  def encode(df: DataFrame, idCol: String, textCol: String, model: Model,
      maxPieceLen: Int = 8): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model.logProbs)
    val enc = udf((text: String) => {
      val words = Option(text).getOrElse("").toLowerCase
        .split("[^a-z]+").filter(_.nonEmpty)
      // a word with a character unseen in training has NO lattice path —
      // fall back to characters (round-trip stays lossless, spec-pinned)
      val toks = words.flatMap { w =>
        val seg = viterbi(bc.value, w, maxPieceLen)
        if (seg.isEmpty && w.nonEmpty) w.map(_.toString).toVector else seg
      }
      (words.length, toks.length, toks)
    })
    df.select(col(idCol), enc(col(textCol)).as("e"))
      .select(col(idCol), col("e._1").as("n_words"),
        col("e._2").as("n_pieces"), col("e._3").as("tokens"))
  }
}
