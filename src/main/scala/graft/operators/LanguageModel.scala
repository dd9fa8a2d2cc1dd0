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
}
