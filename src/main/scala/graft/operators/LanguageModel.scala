package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Count-based n-gram language model over a corpus, the CCNet-style
  * quality signal: train unigram/bigram counts on a trusted reference
  * slice, score every document by stupid-backoff likelihood, and filter
  * the tail. "Perplexity filtering" in LLM data pipelines is exactly this
  * — no neural net required: the model is a pair of count tables and the
  * scorer is a join.
  *
  * Tokenization matches [[CorpusOps.vocabulary]] (lowercase alpha runs),
  * so the count tables double as the vocabulary artifact. Bigrams are the
  * space-joined adjacent pair, built with the same zip_with shift-chain
  * as the shingle functions — one pass, no per-index re-tokenization
  * (alpha tokens carry no spaces, so the string form is lossless).
  *
  * Scale shape for 100 TB: counts are groupBys with map-side partial
  * combine, one shuffle each, keyed by gram. Scoring joins the exploded
  * bigram stream against `broadcast()` count tables — `minCount` prunes
  * the long tail so both stay broadcastable (a 1M-row vocab and 10M-row
  * bigram table are tens of MB) — which keeps the document side
  * SHUFFLE-FREE end to end: explode → broadcast joins → per-doc
  * aggregation with map-side combine on the doc id.
  */
object LanguageModel {

  private def toks(textCol: String): Column =
    filter(split(lower(col(textCol)), "[^a-z]+"), t => t =!= lit(""))

  /** Adjacent-pair "w1 w2" strings, one per position (non-distinct). */
  private def bigramsOf(t: Column): Column =
    filter(
      zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      g => g.isNotNull)

  /** (token, c) unigram counts, `c >= minCount`. */
  def unigramCounts(df: DataFrame, textCol: String,
      minCount: Long = 1L): DataFrame =
    df.select(explode(toks(textCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)

  /** (bigram, c) counts over in-document adjacent pairs, `c >= minCount`. */
  def bigramCounts(df: DataFrame, textCol: String,
      minCount: Long = 1L): DataFrame =
    df.select(explode(bigramsOf(toks(textCol))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)

  /** Score each document under stupid backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation"): for each adjacent
    * pair (w1, w2),
    * `S(w2|w1) = c(w1 w2)/c(w1)` if the bigram was seen, else
    * `alpha * c(w2)/total` if w2 was seen, else `alpha/total`.
    *
    * Emits per doc: exact integer evidence (`n_tokens`, `oov_tokens`,
    * `n_bigrams`, `hit_bigrams`) and their single-division rates — these
    * compare bitwise against any engine — plus the floating
    * `avg_logprob` (mean ln S over bigram positions) and
    * `ppl = exp(-avg_logprob)`, which are order-summed floats and belong
    * behind spec gates, not a SQL hash compare. Documents with zero
    * alpha tokens produce no rows (no evidence either way); documents
    * with one token appear with null bigram columns' rates.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      uni: DataFrame, bi: DataFrame, alpha: Double = 0.4): DataFrame = {
    val total = uni.agg(coalesce(sum(col("c")), lit(0L)).cast(LongType))
      .head.getLong(0)
    require(total > 0, "unigram table is empty — train on a non-empty corpus")
    val base = docs.select(col(idCol).as("__doc"), toks(textCol).as("__t"))

    val tokStats = base.select(col("__doc"), explode(col("__t")).as("token"))
      .join(broadcast(uni.withColumnRenamed("c", "__cu")), Seq("token"), "left")
      .groupBy("__doc")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__cu").isNull, 1L).otherwise(0L)).as("oov_tokens"))

    val w2 = substring_index(col("bigram"), " ", -1)
    val s = when(col("__cb").isNotNull,
        col("__cb").cast("double") / col("__c1").cast("double"))
      .when(col("__c2").isNotNull,
        lit(alpha) * col("__c2").cast("double") / lit(total.toDouble))
      .otherwise(lit(alpha) / lit(total.toDouble))
    val bgStats = base
      .select(col("__doc"), explode(bigramsOf(col("__t"))).as("bigram"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", w2)
      .join(broadcast(bi.withColumnRenamed("c", "__cb")), Seq("bigram"), "left")
      .join(broadcast(uni.select(col("token").as("w1"), col("c").as("__c1"))),
        Seq("w1"), "left")
      .join(broadcast(uni.select(col("token").as("w2"), col("c").as("__c2"))),
        Seq("w2"), "left")
      .groupBy("__doc")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__cb").isNotNull, 1L).otherwise(0L)).as("hit_bigrams"),
        sum(log(s)).as("__sum_lp"))

    tokStats.join(bgStats, Seq("__doc"), "left")
      .select(col("__doc").as(idCol),
        col("n_tokens"), col("oov_tokens"),
        (col("oov_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("hit_bigrams"), lit(0L)).as("hit_bigrams"),
        when(col("n_bigrams") > 0,
          col("hit_bigrams").cast("double") / col("n_bigrams").cast("double"))
          .as("bigram_hit_rate"),
        when(col("n_bigrams") > 0, col("__sum_lp") / col("n_bigrams").cast("double"))
          .as("avg_logprob"),
        when(col("n_bigrams") > 0,
          exp(-(col("__sum_lp") / col("n_bigrams").cast("double")))).as("ppl"))
  }

  /** Interpolated Kneser-Ney bigram probabilities, per position — the
    * stronger smoothing beside stupid backoff (Kneser & Ney 1995; Chen &
    * Goodman 1999 empirically crown interpolated KN among count LMs):
    *
    * `P(w2|w1) = max(c12 − d, 0)/ctot + (d·n_succ(w1)/ctot) · Pcont(w2)`
    *
    * where `ctot(w1) = Σ_w2 c(w1 w2)` is the CONTEXT TOTAL — the number
    * of times w1 was actually followed by anything. This is NOT the
    * unigram count c1: a w1 that ends a document is counted in c1 but
    * starts no bigram, and dividing by c1 there would leave
    * Σ_vocab P(·|w1) < 1 (the normalization spec probes exactly that
    * case). The CONTINUATION probability `Pcont(w2) = (n_pred(w2)+1)/(B+V)`
    * counts in how many distinct contexts w2 was seen (n_pred), not how
    * often — "Francisco" is frequent but only ever follows "San", so its
    * continuation mass is tiny. The +1/(B+V) add-one on continuation
    * counts is the OOV floor (an unseen w2 gets 1/(B+V), never zero) and
    * preserves exact normalization: Σ_vocab P(w2|w1) = 1 for any context
    * with observed successors (spec-pinned numerically). An unseen
    * context — or one observed only sentence-finally, which has no
    * discounted mass to redistribute — backs off to Pcont alone.
    *
    * Every model quantity is a one-pass relational aggregate of the
    * bigram table — counts (c12, c1), distinct-successor (n_succ) and
    * distinct-predecessor (n_pred) counts, B = distinct bigrams, V =
    * vocabulary — and `p` is a fixed-association chain of IEEE ops over
    * those exact integers and the literal discount, so the stream is
    * oracle-checkable BITWISE (the `pmi_ratio` precedent); log-space
    * aggregation lives in [[scoreDocsKn]] behind spec gates.
    *
    * Scale shape: identical to [[scoreDocs]] — the document side explodes
    * to its bigram stream and joins `broadcast()` model tables; no
    * corpus-side shuffle at scoring time.
    *
    * Emits per position:
    * (doc, pos, w1, w2, c12, c1, ctot, n_succ, n_pred, p).
    */
  def knProbStream(docs: DataFrame, idCol: String, textCol: String,
      uni: DataFrame, bi: DataFrame, d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, s"discount must be in (0,1), got $d")
    val b = bi.count()
    require(b > 0, "bigram table is empty — train on a non-empty corpus")
    val v = uni.count()
    // one pass over the bigram table yields both per-context quantities:
    // the distinct-successor count AND the context total (the KN
    // denominator — see the normalization note above).
    val nSucc = bi.groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("n_succ"), sum(col("c")).as("ctot"))
    val nPred = bi.groupBy(substring_index(col("bigram"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("n_pred"))
    val stream = docs.select(col(idCol).as("doc"),
      posexplode(bigramsOf(toks(textCol))).as(Seq("pos", "bigram")))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(broadcast(bi.withColumnRenamed("c", "c12")), Seq("bigram"), "left")
      .join(broadcast(uni.select(col("token").as("w1"), col("c").as("c1"))),
        Seq("w1"), "left")
      .join(broadcast(nSucc), Seq("w1"), "left")
      .join(broadcast(nPred), Seq("w2"), "left")
    // fixed association order, mirrored token for token in the oracle SQL.
    // Gate on n_succ (not c1): a context observed only sentence-finally
    // has a unigram count but NO successors, so it carries no discounted
    // mass to redistribute — it backs off to the continuation
    // distribution exactly like an unseen context. c12 coalesces to 0
    // explicitly so both engines' `greatest` see a non-null argument.
    val pcont = (coalesce(col("n_pred"), lit(0L)).cast("double") + lit(1.0)) /
      lit((b + v).toDouble)
    val p = when(col("n_succ").isNotNull,
      greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(d),
        lit(0.0)) / col("ctot").cast("double") +
        lit(d) * col("n_succ").cast("double") / col("ctot").cast("double") *
          pcont)
      .otherwise(pcont)
    stream.select(col("doc"), col("pos").cast(LongType).as("pos"),
      col("w1"), col("w2"),
      coalesce(col("c12"), lit(0L)).as("c12"),
      coalesce(col("c1"), lit(0L)).as("c1"),
      coalesce(col("ctot"), lit(0L)).as("ctot"),
      coalesce(col("n_succ"), lit(0L)).as("n_succ"),
      coalesce(col("n_pred"), lit(0L)).as("n_pred"),
      p.as("p"))
  }

  /** Per-doc interpolated-KN scores over [[knProbStream]]: bigram
    * positions, the summed ln P (order-dependent floats → spec-gated,
    * like [[scoreDocs]]'s avg_logprob), and `ppl = exp(−mean ln P)`.
    */
  def scoreDocsKn(docs: DataFrame, idCol: String, textCol: String,
      uni: DataFrame, bi: DataFrame, d: Double = 0.75): DataFrame =
    knProbStream(docs, idCol, textCol, uni, bi, d)
      .groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12") > 0, 1L).otherwise(0L)).as("hit_bigrams"),
        sum(log(col("p"))).as("__slp"))
      .select(col("doc").as(idCol), col("n_bigrams"), col("hit_bigrams"),
        (col("__slp") / col("n_bigrams").cast("double")).as("avg_logprob"),
        exp(-(col("__slp") / col("n_bigrams").cast("double"))).as("ppl"))

  /** Train on `corpus`, score `docs`, keep documents whose stupid-backoff
    * perplexity is at most `maxPpl` (docs with no bigram evidence drop —
    * the quality gates catch degenerate texts separately).
    */
  def perplexityFilter(corpus: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, maxPpl: Double, minCount: Long = 1L,
      alpha: Double = 0.4): DataFrame = {
    val uni = unigramCounts(corpus, textCol, minCount)
    val bi = bigramCounts(corpus, textCol, minCount)
    scoreDocs(docs, idCol, textCol, uni, bi, alpha)
      .filter(col("ppl").isNotNull && col("ppl") <= maxPpl)
  }

  /** [[perplexityFilter]] under interpolated Kneser-Ney ([[scoreDocsKn]])
    * — the same train→score→threshold contract with the stronger
    * smoothing.
    */
  def perplexityFilterKn(corpus: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, maxPpl: Double, minCount: Long = 1L,
      d: Double = 0.75): DataFrame = {
    val uni = unigramCounts(corpus, textCol, minCount)
    val bi = bigramCounts(corpus, textCol, minCount)
    scoreDocsKn(docs, idCol, textCol, uni, bi, d)
      .filter(col("ppl").isNotNull && col("ppl") <= maxPpl)
  }
}
