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
    // per-doc bucket counts are the ONE raw-corpus gram pass; the raw
    // model derives from them exactly (cr(b) = Σ_doc f(doc, b) — same
    // gram stream, same hash, integer counts), so raw is never exploded
    // twice. localCheckpoint materializes fb for its two consumers; fb
    // IS the evidence output shape, so the cache is output-sized. The
    // target model keeps its own pass: DSIR's target is in general a
    // DIFFERENT (usually much smaller) corpus, not a subset of raw.
    val fb = raw.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc"), explode(grams(col(textCol))).as("g"))
      .select(col("doc"), (md5Hash52(col("g")) % dim).as("bucket"))
      .groupBy(col("doc"), col("bucket")).agg(count(lit(1)).as("f"))
      .localCheckpoint(true)
    val rc = fb.groupBy(col("bucket")).agg(sum(col("f")).as("cnt"))
    val nT = tc.agg(coalesce(sum(col("cnt")), lit(0L))).collect().head.getLong(0)
    val nR = rc.agg(coalesce(sum(col("cnt")), lit(0L))).collect().head.getLong(0)
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

  /** Modulus for [[modWeightsFromEvidence]]: 2^61 − 1 (Mersenne prime).
    * Residues are < 2^61, so a modmul fits DECIMAL(38,0) on the Spark
    * side ((2^61)^2 ≈ 5.3e36) and HUGEINT on DuckDB's.
    */
  val ModP = 2305843009213693951L

  /** The importance weight as an EXACT number, oracle-checkable: the
    * weight is the rational
    * {{{
    *   Π_grams (ct_g + 1)·(N_r + dim)  /  Π_grams (cr_g + 1)·(N_t + dim)
    * }}}
    * (exp of [[weightsFromEvidence]]'s log_weight). Its integer
    * numerator/denominator are astronomically large, but their images
    * mod a fixed prime are exact BIGINTs both engines fold identically —
    * and because modular multiplication is associative and commutative,
    * the fold needs NO ordering discipline at all (unlike the float
    * path's sorted ln sums). Emits `(doc, n_grams, num_mod, den_mod)`
    * from the same [[importanceEvidence]] rows the integer gate checks,
    * so the full rational weight of every doc is oracle-proven
    * (`q_dsir_modweights`); only the final rational→double `ln` at the
    * output edge remains engine-specific (the pinned float faces).
    */
  def modWeightsFromEvidence(ev: DataFrame, dim: Int): DataFrame = {
    val p = ModP
    // one row per gram occurrence (bucket rows expand by f), so each
    // factor enters the product exactly as many times as the gram occurs
    val rep = ev.select(col("doc"), col("ct"), col("cr"),
      col("n_target"), col("n_raw"),
      explode(expr("sequence(1, f)")).as("__rep"))
    rep.select(col("doc"),
        expr(s"CAST((CAST(ct + 1 AS DECIMAL(19,0)) * (n_raw + $dim)) % $p" +
          s" AS DECIMAL(19,0))").as("nf"),
        expr(s"CAST((CAST(cr + 1 AS DECIMAL(19,0)) * (n_target + $dim)) % $p" +
          s" AS DECIMAL(19,0))").as("df"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_grams"),
        collect_list(col("nf")).as("__nfs"),
        collect_list(col("df")).as("__dfs"))
      .select(col("doc"), col("n_grams"),
        expr(s"CAST(aggregate(__nfs, CAST(1 AS DECIMAL(19,0)), " +
          s"(acc, x) -> CAST((acc * x) % $p AS DECIMAL(19,0))) AS BIGINT)")
          .as("num_mod"),
        expr(s"CAST(aggregate(__dfs, CAST(1 AS DECIMAL(19,0)), " +
          s"(acc, x) -> CAST((acc * x) % $p AS DECIMAL(19,0))) AS BIGINT)")
          .as("den_mod"))
  }

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
