package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.TextFunctions

/** DSIR-style data selection via importance resampling: score every raw
  * document by how much more likely its hashed n-gram bag is under a
  * TARGET distribution (the curated/high-quality slice you want more
  * of) than under the RAW distribution, then draw the selection with
  * Gumbel-top-k — the standard way to sample ∝ weight when all you
  * have are log-weights. (Method: Xie et al., "Data Selection for
  * Language Models via Importance Resampling", 2023 — public paper;
  * this is an independent Spark-native implementation.)
  *
  * Scale design: both feature models are `dim`-bounded count tables
  * (one groupBy each; vocabulary never materializes), broadcast into
  * the scoring join, so the raw corpus is shuffled only by
  * `(doc, bucket)` for its own per-doc feature counts — O(corpus
  * grams), no join ever moves the corpus by anything global. The
  * Gumbel keys are hash-derived (the portable md5-52 family), so the
  * "sampling" is deterministic, reproducible in any engine, and free
  * of RNG state — the same philosophy as the corpus shuffle/split ops.
  *
  * Float discipline: per-doc sums fold over bucket-sorted contribution
  * lists (`aggregate(sort_array(...))` ↔ DuckDB
  * `list_aggregate(list(... ORDER BY ...), 'sum')`), so the summation
  * order — and therefore every last bit of the double — is fixed.
  */
object ImportanceResampling {

  /** 52-bit md5-derived hash (engine-portable; [[Dedup]]'s family). */
  private def md5Hash52(c: Column): Column =
    conv(substring(md5(to_binary(c, lit("utf-8"))), 20, 13), 16, 10)
      .cast(LongType)

  /** The gram stream: whitespace unigrams plus word bigrams (all
    * occurrences, not per-doc distinct — these are COUNT features).
    */
  private def grams(text: Column): Column =
    concat(TextFunctions.tokens(text), TextFunctions.wordShinglesAll(text, 2))

  /** Hashed bag-of-ngrams model of a corpus slice: `(bucket, cnt)` with
    * at most `dim` rows — one exploding groupBy, broadcastable ever
    * after.
    */
  def fitHashedCounts(df: DataFrame, textCol: String,
      dim: Int = 4096): DataFrame = {
    require(dim >= 2 && dim <= (1 << 22), s"dim out of range: $dim")
    df.filter(col(textCol).isNotNull)
      .select(explode(grams(col(textCol))).as("g"))
      .select((md5Hash52(col("g")) % dim).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** The exact sufficient statistics of every raw doc's weight:
    * `(doc, bucket, f, ct, cr, n_target, n_raw)` — per-doc hashed-gram
    * counts joined with both models' bucket counts and corpus totals.
    * All integers: this face IS the oracle gate (the float weight below
    * is a deterministic pure function of these rows, but its hundreds
    * of ln terms per doc accumulate cross-engine ulp drift, so it gets
    * a golden pin instead). Docs with NULL text are excluded (no gram
    * evidence, no weight); empty text still carries the "" token.
    */
  def importanceEvidence(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, dim: Int = 4096): DataFrame = {
    val tc = fitHashedCounts(target, textCol, dim)
    val rc = fitHashedCounts(raw, textCol, dim)
    val nT = tc.agg(coalesce(sum(col("cnt")), lit(0L))).collect().head.getLong(0)
    val nR = rc.agg(coalesce(sum(col("cnt")), lit(0L))).collect().head.getLong(0)
    val fb = raw.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc"), explode(grams(col(textCol))).as("g"))
      .select(col("doc"), (md5Hash52(col("g")) % dim).as("bucket"))
      .groupBy(col("doc"), col("bucket")).agg(count(lit(1)).as("f"))
    fb.join(broadcast(tc.withColumnRenamed("cnt", "ct")), Seq("bucket"), "left")
      .join(broadcast(rc.withColumnRenamed("cnt", "cr")), Seq("bucket"), "left")
      .select(col("doc"), col("bucket"), col("f"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        lit(nT).as("n_target"), lit(nR).as("n_raw"))
  }

  /** Per-document log importance weight of every raw doc:
    * `(doc, n_grams, log_weight)` where
    * {{{
    *   log_weight = Σ_b f_b · (ln(c_t(b)+1) − ln(c_r(b)+1))
    *              + n_grams · (ln(N_r + dim) − ln(N_t + dim))
    * }}}
    * — the log-ratio of add-one-smoothed hashed-unigram likelihoods,
    * computed FROM [[importanceEvidence]] so the scored face can never
    * drift from the oracle-checked statistics.
    */
  def logImportanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, dim: Int = 4096): DataFrame =
    weightsFromEvidence(importanceEvidence(raw, target, idCol, textCol, dim),
      dim)

  /** [[logImportanceWeights]] from an evidence frame. */
  def weightsFromEvidence(ev: DataFrame, dim: Int): DataFrame =
    ev.select(col("doc"), col("bucket"), col("f"),
        col("n_target"), col("n_raw"),
        (col("f").cast(DoubleType) *
          (log(col("ct").cast(DoubleType) + 1.0) -
            log(col("cr").cast(DoubleType) + 1.0))).as("c"))
      .groupBy(col("doc"))
      .agg(sum(col("f")).as("n_grams"),
        aggregate(sort_array(collect_list(struct(col("bucket"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("ratio_sum"),
        first(col("n_target")).as("n_target"),
        first(col("n_raw")).as("n_raw"))
      .select(col("doc"), col("n_grams"),
        (col("ratio_sum") + col("n_grams").cast(DoubleType) *
          (log(col("n_raw").cast(DoubleType) + dim) -
            log(col("n_target").cast(DoubleType) + dim)))
          .as("log_weight"))

  /** Gumbel-top-k selection over [[logImportanceWeights]] output:
    * `(doc, log_weight, sel_key)`, the k docs with the largest
    * `log_weight + Gumbel(hash(seed, doc))` — an exact sample ∝ weight
    * without replacement, yet fully deterministic: the Gumbel noise is
    * `-ln(-ln((h + 0.5) / 2^52))` over the portable doc hash (the +0.5
    * dodges both endpoints of the unit interval).
    */
  def gumbelTopK(weights: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val u = (md5Hash52(concat_ws("|", lit(seed), col("doc")))
      .cast(DoubleType) + 0.5) / lit((1L << 52).toDouble)
    weights
      .select(col("doc"), col("log_weight"),
        (col("log_weight") - log(-log(u))).as("sel_key"))
      .orderBy(col("sel_key").desc, col("doc"))
      .limit(k)
  }
}
