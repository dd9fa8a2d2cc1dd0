package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stratified corpus sampling with exact largest-remainder (Hamilton)
  * apportionment — the standard way to cut a fixed-size eval/probe set
  * whose strata proportions mirror the corpus (reference analog: the
  * per-CIK grouping discipline of `core/company.py:287-303` applied to
  * sampling; LLM-pipeline analog: building a held-out set whose
  * lang × source mix matches training).
  *
  * Why not `df.sampleBy` / `randomSplit`: both are Bernoulli draws —
  * the realized stratum counts fluctuate and change under partition
  * resizing. Here the quota per stratum is a pure integer function of
  * the stratum sizes (floor(total·n_h/N) plus one for the largest
  * remainders until the total is exact), and membership is a pure
  * function of the row key (md5-rank within stratum), so the same
  * corpus always yields the same sample, the total is EXACTLY `total`,
  * and no stratum deviates from exact proportionality by more than one
  * row — the apportionment with zero "Alabama paradox" drift under
  * corpus growth within a stratum.
  *
  * Scale shape: quota derivation is one groupBy over the corpus (the
  * stratum-size aggregation, map-side combined to |strata| rows) plus a
  * broadcast inequality join over the strata table (remainder ranking
  * without a global window sort); selection ranks rows only
  * WITHIN each stratum partition (no global sort). At extreme per-
  * stratum cardinality the rank-≤-quota selection is the k-smallest-
  * of-group shape (KMV's bounded-buffer aggregator with k = quota)
  * rather than a window — the window form here is the exact oracle
  * face, and every arithmetic step is integer so DuckDB replays it
  * bit-for-bit.
  */
object Stratified {

  /** Portable 52-bit hash — `('0x' || substr(md5(x), 20, 13))::BIGINT`
    * in DuckDB; the registry-wide cross-engine hash family.
    */
  private def h52(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(to_binary(c.cast("string"), lit("utf-8"))), 20, 13),
      16, 10).cast(LongType)

  /** Hamilton quotas: one row per stratum with its size, floor share,
    * remainder, and final quota. Σ quota == min(total, N) exactly.
    *
    * Integer-only: base = (total·n_h) div N, rem = (total·n_h) mod N,
    * and the Σbase shortfall goes to the largest remainders (ties broken
    * by stratum key ascending — deterministic, engine-portable).
    * Overflow bound: total·n_h must fit a signed long — at total ≤ 10^6
    * that allows strata of 9·10^12 rows.
    */
  def allocate(df: DataFrame, strataCols: Seq[String],
      total: Long): DataFrame =
    allocateByWeight(df, strataCols, total, col("n_rows"))

  /** Temperature-flattened quotas (the multilingual-sampling α = 1/2):
    * stratum weight = ⌊√n_h⌋ instead of n_h, so low-resource strata are
    * up-weighted relative to proportional draw. The integer square root
    * is computed exactly (a double `sqrt` seeded value corrected by ±1
    * against the integer square) so both engines derive identical
    * weights; quotas are Hamilton over those weights. A tiny stratum
    * can be allotted more rows than it has — [[sample]] then yields the
    * whole stratum and the realized draw falls short of `total`; the
    * quota column is the target, n_rows the attainable cap.
    */
  def temperatureAllocate(df: DataFrame, strataCols: Seq[String],
      total: Long): DataFrame = {
    // exact isqrt: floor(sqrt(n)) with the float result corrected so a
    // half-ulp rounding at a perfect square can't shift the floor
    val s0 = floor(sqrt(col("n_rows").cast("double"))).cast(LongType)
    val s1 = s0 - when(s0 * s0 > col("n_rows"), 1L).otherwise(0L)
    val isqrt = s1 + when((s1 + 1) * (s1 + 1) <= col("n_rows"), 1L)
      .otherwise(0L)
    allocateByWeight(df, strataCols, total, isqrt)
  }

  /** Hamilton apportionment of `total` across strata ∝ an integer
    * weight expression over the per-stratum size column `n_rows`.
    */
  private def allocateByWeight(df: DataFrame, strataCols: Seq[String],
      total: Long, weight: org.apache.spark.sql.Column): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(total > 0, "total must be positive")
    val key = strataCols.map(col)
    val sizes = df.groupBy(key: _*)
      .agg(count(lit(1)).cast(LongType).as("n_rows"))
      .withColumn("w", weight.cast(LongType))
    // ΣW as a one-row broadcast against the strata table
    val based = sizes
      .crossJoin(
        broadcast(sizes.agg(sum("w").cast(LongType).as("w_total"))))
      .withColumn("base", expr(s"$total * w div w_total"))
      .withColumn("rem", (lit(total) * col("w")) % col("w_total"))
    // remainder rank without a global window (which would warn and, at
    // high strata cardinality, single-partition-sort): rank = 1 + the
    // number of strata strictly ahead under (rem desc, key asc) — a
    // broadcast inequality join over the strata-bounded table
    val keyStruct = struct(key: _*)
    val ahead = based.select(col("rem").as("b_rem"), keyStruct.as("b_key"))
    val leftover = broadcast(
      based.agg((lit(total) - sum("base")).cast(LongType).as("leftover")))
    based
      .withColumn("a_key", keyStruct)
      .join(broadcast(ahead),
        col("b_rem") > col("rem") ||
          (col("b_rem") === col("rem") && col("b_key") < col("a_key")),
        "left")
      .groupBy(key :+ col("n_rows") :+ col("w") :+ col("base")
        :+ col("rem"): _*)
      .agg((count(col("b_key")) + 1).cast(LongType).as("rem_rank"))
      .crossJoin(leftover)
      .withColumn("quota",
        (col("base") + when(col("rem_rank") <= col("leftover"), 1L)
          .otherwise(0L)).cast(LongType))
      .select(key :+ col("n_rows") :+ col("w") :+ col("base")
        :+ col("rem") :+ col("quota"): _*)
  }

  /** The sample: per stratum, the `quota` rows with the smallest
    * portable hash of `idCol` (id-ascending tiebreak). Deterministic,
    * proportionally exact, and replayable by any engine with md5.
    */
  def sample(df: DataFrame, idCol: String, strataCols: Seq[String],
      total: Long): DataFrame = {
    val quotas = broadcast(
      allocate(df, strataCols, total).select(
        strataCols.map(col) :+ col("quota"): _*))
    val rk = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(h52(col(idCol)).asc, col(idCol).asc)
    df.select(col(idCol) +: strataCols.map(col): _*)
      .withColumn("strat_rank", row_number().over(rk).cast(LongType))
      .join(quotas, strataCols)
      .filter(col("strat_rank") <= col("quota"))
      .drop("quota")
  }

  /** Probability-proportional-to-size order sample (sequential Poisson,
    * Ohlsson 1998; the uniform-priority cousin of Efraimidis–Spirakis
    * weighted reservoir and Duffield–Lund–Thorup priority sampling):
    * each row draws a deterministic uniform u from the portable md5-52
    * hash of its id and competes on the order key u/w — the k smallest
    * keys are the sample, so a row with twice the weight has (to first
    * order) twice the inclusion probability. One pass, fixed k, no
    * accept/reject loop: the weighted analog of `sample`'s hash-rank
    * draw for when rows should win in proportion to tokens/bytes
    * rather than uniformly (LLM-pipeline analog: cutting a fixed-size
    * probe set where long documents deserve proportionally more slots;
    * reference analog: the per-company download quota discipline of
    * `core/company.py:287-303` weighted by filing size).
    *
    * Exactness: the real-valued key u/w is quantized to the integer
    * `(u·2048) div w` so BOTH engines compare identical BIGINTs — u is
    * 52-bit so u·2048 < 2^63 never overflows, and a double division
    * (whose ulp could flip the k-th boundary between engines) never
    * happens. Ties (same quantized key) break by id ascending, so the
    * draw is a pure function of (corpus, k). Weights must be ≥ 1;
    * nonpositive-weight rows are excluded by contract (they have zero
    * selection mass).
    *
    * Scale shape: the key is map-side arithmetic on the scan; the
    * global k-smallest compiles to TakeOrderedAndProject (per-partition
    * top-k heaps merged once — no global sort shuffle, no window). At
    * 100 TB the only data movement is k rows per partition to one
    * reducer.
    */
  def ppsSample(df: DataFrame, idCol: String,
      weight: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    requireFreeNames(df, Seq("w", "u", "pps_key"))
    df.withColumn("w", weight.cast(LongType))
      .filter(col("w") >= 1L)
      .withColumn("u", h52(col(idCol)))
      .withColumn("pps_key", expr("(u * 2048) div w"))
      .orderBy(col("pps_key").asc, col(idCol).asc)
      .limit(k)
  }

  /** Per-stratum PPS draw: the k smallest sequential-Poisson keys
    * WITHIN each stratum (the [[ppsSample]] competition run per group).
    * Ranking is a window partitioned by the strata — per-key top-k with
    * no global sort; at extreme per-stratum cardinality the same
    * bounded-buffer aggregation note as [[sample]] applies.
    */
  def ppsSamplePerStratum(df: DataFrame, idCol: String,
      strataCols: Seq[String], weight: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(k > 0, "k must be positive")
    requireFreeNames(df, Seq("w", "u", "pps_key", "pps_rank"))
    val rk = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("pps_key").asc, col(idCol).asc)
    df.withColumn("w", weight.cast(LongType))
      .filter(col("w") >= 1L)
      .withColumn("u", h52(col(idCol)))
      .withColumn("pps_key", expr("(u * 2048) div w"))
      .withColumn("pps_rank", row_number().over(rk).cast(LongType))
      .filter(col("pps_rank") <= k)
  }

  /** Loud failure instead of silently clobbering caller columns with
    * the sampler's working names (the rollingStats/ewma guard family).
    */
  private def requireFreeNames(df: DataFrame, names: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"input already has reserved output column(s): ${clash.mkString(", ")}")
  }
}
