package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Token co-occurrence statistics — the corpus-analytics face of
  * word-embedding pipelines (word2vec/GloVe preprocessing) and collocation
  * mining. Semantics follow the classic skip-gram definition: an ordered
  * pair (a, b) is counted once for every occurrence of token b within
  * `window` positions AFTER an occurrence of token a.
  *
  * Scale shape: pair generation is pure map-side array arithmetic over
  * each doc's own token array (no self-join on position — a position join
  * explodes into a shuffle of every token row); the only corpus-scale
  * shuffle is the (a, b) count aggregation with map-side partials. The
  * unigram table and the two scalar totals are vocabulary-sized /
  * 1-row — broadcast joins. PMI folds exact integer counts into one
  * double ratio and a single `ln`, so both engines compute bit-identical
  * values from identical inputs.
  */
object Cooccur {

  /** Skip-gram pair counts with PMI, filtered to `c_ab >= minCount`.
    *
    * PMI = ln( (c_ab / n_pairs) / ((c_a / n_tok) · (c_b / n_tok)) ),
    * computed as ln( (c_ab · n_tok · n_tok) / (n_pairs · c_a · c_b) )
    * with the exact multiplication order mirrored in the oracle SQL.
    *
    * @param window  max forward distance between the pair's positions.
    * @param minCount minimum pair count to emit (bounds the output and
    *                 keeps PMI estimates out of the small-count noise).
    */
  def pmiPairs(df: DataFrame, textCol: String, window: Int = 2,
      minCount: Long = 5L): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(minCount >= 1, "minCount must be >= 1")
    val toks = df.select(split(col(textCol), " ").as("w"))
    // ONE corpus pass emits both streams from each doc's array: a
    // unigram sentinel (b = NULL) per token plus the ordered pairs (each
    // 0-based position i with forward offsets d in [1, window] inside
    // the doc). A naive formulation reads the corpus once per derived
    // table (pairs, two unigram joins, two totals — five scans and five
    // explodes; AQE exchange reuse MAY collapse some at runtime, but the
    // plan shouldn't gamble on it at 100 TB).
    val exploded = toks.select(explode(expr(
      s"""concat(
         |  transform(w, t -> struct(t as a, cast(null as string) as b)),
         |  flatten(transform(w, (t, i) ->
         |    transform(filter(sequence(1, $window), d -> i + d < size(w)),
         |      d -> struct(t as a, w[i + d] as b)))))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    // one shuffle → vocabulary²-bounded table, eagerly materialized so
    // the five consumers below never re-run the corpus pass (explicit,
    // unlike AQE reuse; same justified pattern as Dedup.resolveKeepers)
    val counts = exploded.groupBy("a", "b")
      .agg(count(lit(1)).cast(LongType).as("cnt"))
      .localCheckpoint(true)
    val pairCounts = counts.filter(col("b").isNotNull)
      .select(col("a"), col("b"), col("cnt").as("c_ab"))
    val uni = counts.filter(col("b").isNull)
      .select(col("a").as("tok"), col("cnt").as("c"))
    // scalar totals from the small table, broadcast cross joins
    val nTok = uni.agg(sum("c").as("n_tok"))
    val nPairs = pairCounts.agg(sum("c_ab").as("n_pairs"))
    pairCounts.filter(col("c_ab") >= minCount)
      .join(broadcast(uni.withColumnRenamed("c", "c_a")),
        col("a") === col("tok")).drop("tok")
      .join(broadcast(uni.withColumnRenamed("c", "c_b")),
        col("b") === col("tok")).drop("tok")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nPairs))
      // the RATIO is exact IEEE arithmetic (multiply/divide are
      // correctly rounded, so it's bit-portable across engines); ln is
      // NOT — Java and DuckDB disagree in the last ulp on ~5% of
      // inputs — so oracle gates compare pmi_ratio and pmi stays
      // spec-gated as ln(pmi_ratio)
      .withColumn("pmi_ratio",
        col("c_ab").cast("double") * col("n_tok") * col("n_tok") /
          (col("n_pairs").cast("double") * col("c_a") * col("c_b")))
      .withColumn("pmi", log(col("pmi_ratio")))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        col("pmi_ratio"), col("pmi"))
  }

  /** Token frequency spectrum (count-of-counts): how many distinct tokens
    * occur exactly `freq` times — the Zipf diagnostic a tokenizer/vocab
    * decision reads. Two cascaded hash aggregations, both with map-side
    * partials; no window, no sort until the output edge.
    */
  def frequencySpectrum(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .groupBy("freq").agg(count(lit(1)).cast(LongType).as("n_tokens"))
      .withColumn("freq", col("freq").cast(LongType))
      .select("freq", "n_tokens")
}
