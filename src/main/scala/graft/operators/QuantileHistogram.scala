package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mergeable quantile histogram — the scale path for percentiles where
  * the exact two-phase `percentile()` pass would still sort-shuffle
  * every value: latency/price/token-count distributions over 100 TB in
  * one pass with a few-thousand-row state, any quantile answerable from
  * the state alone, and a HARD relative-error bound instead of a
  * probabilistic one.
  *
  * The design is the HdrHistogram bucket rule (log2 major buckets ×
  * 2^s linear sub-buckets): a non-negative long lands in
  *   - bucket `v` itself while `v < 2^s` (exact regime), else
  *   - bucket `(msb−s)·2^s + (v >> (msb−s))` where `msb =
  *     bit_length(v)−1` — the top s+1 bits of v, so within a bucket
  *     `max/min ≤ 1 + 2^−s`.
  * Everything is integer arithmetic on `length(bin(v))` and shifts —
  * both engines reproduce the state AND the quantile answers
  * bit-for-bit (the [[CardinalitySketch]] rho trick, widened).
  *
  * Each bucket keeps `(cnt, v_min, v_max)`; a quantile rank resolves to
  * its bucket by cumulative count, and the answer is sandwiched by
  * REAL data values (`v_min ≤ true quantile ≤ v_max`), not a modeled
  * midpoint — so the error bound holds even for pathological
  * in-bucket distributions.
  *
  * Scale design: the state build is one groupBy whose map-side partial
  * collapses to ≤ 58·2^s + 2^s cells per task; the quantile resolution
  * runs over the bounded state (a single-partition window — fine at
  * ≤ few thousand rows, the same shape every sketch-resolution face
  * here uses). Buckets merge by `(sum cnt, min v_min, max v_max)` —
  * EXACTLY the histogram of the concatenated inputs, so per-batch
  * states can be appended and folded, the sketch-store recipe.
  */
object QuantileHistogram {

  private def requireS(s: Int): Unit =
    require(s >= 1 && s <= 12, s"sub-bucket bits must be in [1,12], got $s")

  /** Build the histogram: `(bucket_id, cnt, v_min, v_max)` — bounded by
    * the value range's bit width × 2^s, regardless of input size.
    * Null values are skipped (no magnitude); a negative value raises —
    * the log2 rule needs non-negative magnitudes (shift a signed metric
    * into [0, ∞) first).
    */
  def histState(df: DataFrame, valueCol: String, s: Int = 6): DataFrame = {
    requireS(s)
    val v = col(valueCol).cast(LongType)
    df.filter(v.isNotNull)
      // the guard rides the value path so column pruning cannot drop it
      .select(when(v < 0, raise_error(
          lit("quantile histogram requires non-negative values")))
        .otherwise(v).as("v"))
      .withColumn("msb", (length(bin(col("v"))) - 1).cast(LongType))
      .select(
        when(col("v") < (1L << s), col("v"))
          .otherwise((col("msb") - s) * (1L << s) +
            expr(s"shiftright(v, CAST(msb - $s AS INT))"))
          .as("bucket_id"),
        col("v"))
      .groupBy(col("bucket_id"))
      .agg(count(lit(1)).as("cnt"), min(col("v")).as("v_min"),
        max(col("v")).as("v_max"))
  }

  /** Per-key histograms `(key, bucket_id, cnt, v_min, v_max)` — the
    * per-domain/per-source distribution profile. One groupBy, map-side
    * partials ≤ keys × cells per task, no per-key sort anywhere.
    */
  def histStatePerKey(df: DataFrame, keyCol: String, valueCol: String,
      s: Int = 6): DataFrame = {
    requireS(s)
    val v = col(valueCol).cast(LongType)
    df.filter(v.isNotNull)
      .select(col(keyCol).as("key"),
        when(v < 0, raise_error(
          lit("quantile histogram requires non-negative values")))
        .otherwise(v).as("v"))
      .withColumn("msb", (length(bin(col("v"))) - 1).cast(LongType))
      .select(col("key"),
        when(col("v") < (1L << s), col("v"))
          .otherwise((col("msb") - s) * (1L << s) +
            expr(s"shiftright(v, CAST(msb - $s AS INT))"))
          .as("bucket_id"),
        col("v"))
      .groupBy(col("key"), col("bucket_id"))
      .agg(count(lit(1)).as("cnt"), min(col("v")).as("v_min"),
        max(col("v")).as("v_max"))
  }

  /** [[quantiles]] per key: `(key, q_ppm, rank, bucket_id, v_min,
    * v_max)`. The cumulative window partitions by key — fully
    * distributed, unlike the global face's bounded single-partition
    * resolution.
    */
  def quantilesPerKey(state: DataFrame, qPpm: Seq[Long]): DataFrame = {
    require(qPpm.nonEmpty && qPpm.forall(q => q >= 1 && q <= 1000000),
      "quantiles must be in (0, 1] ppm")
    val spark = state.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("key")).orderBy(col("bucket_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = state
      .select(col("key"), col("bucket_id"), col("cnt"), col("v_min"),
        col("v_max"))
      .withColumn("cum", sum(col("cnt")).over(w))
    val totals = state.groupBy(col("key"))
      .agg(sum(col("cnt")).as("n_total"))
    val ranked = totals.crossJoin(broadcast(qPpm.toDF("q_ppm")))
      .withColumn("rank",
        expr("CAST((q_ppm * n_total + 999999) div 1000000 AS BIGINT)"))
    cum.join(ranked, Seq("key"))
      .filter(col("cum") >= col("rank") &&
        (col("cum") - col("cnt")) < col("rank"))
      .select(col("key"), col("q_ppm"), col("rank"), col("bucket_id"),
        col("v_min"), col("v_max"))
  }

  /** Merge state fragments back to one canonical histogram: per-bucket
    * `(sum cnt, min v_min, max v_max)` — EXACTLY the histogram of the
    * concatenated inputs.
    */
  def histMergeState(state: DataFrame): DataFrame =
    state.groupBy(col("bucket_id"))
      .agg(sum(col("cnt")).as("cnt"), min(col("v_min")).as("v_min"),
        max(col("v_max")).as("v_max"))

  /** Resolve quantiles from the state: for each requested quantile (in
    * ppm) the row `(q_ppm, rank, bucket_id, v_min, v_max)` of the bucket
    * where the cumulative count reaches `rank = ceil(q·N / 10^6)`
    * (rank-of-smallest convention, rank ≥ 1). The true order statistic
    * lies in `[v_min, v_max]`, within the 2^−s relative bound.
    */
  def quantiles(state: DataFrame, qPpm: Seq[Long]): DataFrame = {
    require(qPpm.nonEmpty && qPpm.forall(q => q >= 1 && q <= 1000000),
      "quantiles must be in (0, 1] ppm")
    val spark = state.sparkSession
    import spark.implicits._
    val w = Window.orderBy(col("bucket_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = state
      .select(col("bucket_id"), col("cnt"), col("v_min"), col("v_max"))
      .withColumn("cum", sum(col("cnt")).over(w))
    val total = cum.agg(max(col("cum")).as("n_total"))
    val ranked = qPpm.toDF("q_ppm").crossJoin(broadcast(total))
      .withColumn("rank",
        expr("CAST((q_ppm * n_total + 999999) div 1000000 AS BIGINT)"))
    // tiny × bounded non-equi join: the quantile list broadcasts into
    // the state-side nested loop
    cum.join(broadcast(ranked), col("cum") >= col("rank") &&
        (col("cum") - col("cnt")) < col("rank"))
      .select(col("q_ppm"), col("rank"), col("bucket_id"), col("v_min"),
        col("v_max"))
  }
}
