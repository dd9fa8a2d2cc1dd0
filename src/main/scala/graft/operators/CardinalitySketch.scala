package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StringType}

/** Cardinality sketches — the scale path for distinct counting where an
  * exact `count(DISTINCT x)` would shuffle every value: corpus vocabulary
  * size, per-source distinct tokens, and cross-source overlap matrices
  * at 100 TB, in one pass with k-bounded (KMV) or 2^p-bounded (HLL)
  * state.
  *
  * Both sketches run over the engine-portable 52-bit md5 hash family
  * (the [[Dedup]] portable faces' hash), and every emitted number is
  * exact integer arithmetic — k-th order statistics, bit-lengths via
  * `bin()`, integral division — so a DuckDB oracle reproduces not just
  * the sketch STATE but the ESTIMATES bit-for-bit. No float harmonic
  * means, no summation-order sensitivity.
  *
  * Scale design: the KMV aggregator is the [[TopKAggregator]] engine
  * shape — object-hash aggregation whose map-side partial keeps ≤2k
  * values per group per task, so the shuffle is O(tasks × keys × k),
  * independent of corpus size, and duplicate hashes collapse in the
  * buffer (no pre-`distinct` shuffle). HLL state is a plain
  * `groupBy(bucket).agg(max(rho))` — at most 2^p groups end to end.
  */
object CardinalitySketch {

  /** 52-bit md5-derived hash (engine-portable: DuckDB reproduces it as
    * `('0x' || substr(md5(x), 20, 13))::BIGINT`).
    */
  private def md5Hash52(c: Column): Column =
    conv(substring(md5(to_binary(c, lit("utf-8"))), 20, 13), 16, 10)
      .cast(LongType)

  /** k smallest DISTINCT longs — ascending, deduplicated, k-bounded.
    * Map-side partials keep ≤2k entries; compaction is amortized
    * O(log k) per row.
    */
  class MinKAggregator(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def compact(b: Seq[Long]): Seq[Long] =
      b.distinct.sorted.take(k)
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], x: Long): Seq[Long] = {
      val nb = b :+ x
      if (nb.size >= 2 * k) compact(nb) else nb
    }
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      compact(a ++ b)
    override def finish(b: Seq[Long]): Seq[Long] = compact(b)
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  private def requireK(k: Int): Unit =
    require(k >= 2 && k <= 1024, s"k must be in [2,1024], got $k")

  /** The KMV estimator over `(n_state, kth_hash)`: below k the sketch IS
    * the value set (exact count); at k, `DV ≈ (k-1) * 2^52 / h_(k)` with
    * integral division (hashes are uniform on [0, 2^52)).
    */
  private def dvEst(k: Int, nState: Column, kth: Column): Column = {
    val numer = (k - 1).toLong << 52
    when(nState < k, nState)
      .otherwise(expr(s"${numer}L div greatest(kth_hash, 1L)"))
  }

  private def sketchCols(hs: Column): Seq[Column] = Seq(
    size(hs).cast(LongType).as("n_state"),
    element_at(hs, size(hs)).as("kth_hash"))

  /** One KMV sketch row for a whole column: `(n_state, kth_hash,
    * dv_est)`. One object-hash aggregation, no shuffle of the values.
    */
  def kmvEstimate(df: DataFrame, valueCol: String, k: Int = 256): DataFrame = {
    requireK(k)
    val minK = udaf(new MinKAggregator(k))
    df.select(md5Hash52(col(valueCol)).as("h"))
      .filter(col("h").isNotNull)
      .agg(minK(col("h")).as("hs"))
      .select(sketchCols(col("hs")): _*)
      .withColumn("dv_est", dvEst(k, col("n_state"), col("kth_hash")))
  }

  /** Per-key KMV sketches: `(key, n_state, kth_hash, dv_est)` — distinct
    * values per key, one bounded aggregation (shuffle O(keys × k)).
    */
  def kmvPerKey(df: DataFrame, keyCol: String, valueCol: String,
      k: Int = 256): DataFrame = {
    requireK(k)
    val minK = udaf(new MinKAggregator(k))
    df.select(col(keyCol).as("key"), md5Hash52(col(valueCol)).as("h"))
      .filter(col("h").isNotNull)
      .groupBy(col("key")).agg(minK(col("h")).as("hs"))
      .select((col("key") +: sketchCols(col("hs"))): _*)
      .withColumn("dv_est", dvEst(k, col("n_state"), col("kth_hash")))
  }

  /** Pairwise overlap matrix over per-key sketches: `(key_a, key_b,
    * dv_a, dv_b, dv_union, dv_intersect)` for every unordered key pair.
    *
    * The union of two k-sketches keeps the k smallest of the combined
    * state — a valid k-sketch of the UNION of the underlying sets — so
    * `dv_union` uses the same estimator, and the intersection comes from
    * inclusion–exclusion, floored at 0 (the unbiased estimator can go
    * negative for disjoint sets). Exact when both keys carry < k
    * distinct values.
    *
    * Inherently O(|keys|² × k): meant for source-/shard-level overlap
    * matrices (hundreds of keys), never doc-level — `maxKeys` makes the
    * contract explicit. The pair join is two equi-joins on key (no OR
    * predicate that would force a nested-loop plan), and each pair's
    * union state is ≤2k values, so agg buffers stay bounded.
    */
  def kmvOverlap(df: DataFrame, keyCol: String, valueCol: String,
      k: Int = 256, maxKeys: Int = 1000): DataFrame = {
    requireK(k)
    val sk = kmvPerKey(df, keyCol, valueCol, k)
      .localCheckpoint(true) // consumed 3× below (pairs + both sides)
    val nKeys = sk.count()
    require(nKeys <= maxKeys,
      s"kmvOverlap: $nKeys keys exceed maxKeys=$maxKeys (the overlap " +
        "matrix is O(keys² × k); aggregate keys first or raise the cap)")
    val est = sk.select(col("key"), col("dv_est"))
    val pairs = est.select(col("key").as("key_a"), col("dv_est").as("dv_a"))
      .join(est.select(col("key").as("key_b"), col("dv_est").as("dv_b")),
        col("key_a") < col("key_b"))
    val stRows = kmvStateRows(df, keyCol, valueCol, k)
    val unionRows = pairs.select(col("key_a"), col("key_b"))
      .join(stRows.withColumnRenamed("key", "key_a"), Seq("key_a"))
      .unionByName(pairs.select(col("key_a"), col("key_b"))
        .join(stRows.withColumnRenamed("key", "key_b"), Seq("key_b"))
        .select(col("key_a"), col("key_b"), col("h")))
    val unionSketch = unionRows
      .groupBy(col("key_a"), col("key_b"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, k).as("hs"))
      .select(col("key_a"), col("key_b"),
        size(col("hs")).cast(LongType).as("n_state"),
        element_at(col("hs"), size(col("hs"))).as("kth_hash"))
      .withColumn("dv_union", dvEst(k, col("n_state"), col("kth_hash")))
      .select(col("key_a"), col("key_b"), col("dv_union"))
    pairs.join(unionSketch, Seq("key_a", "key_b"))
      .select(col("key_a"), col("key_b"), col("dv_a"), col("dv_b"),
        col("dv_union"),
        greatest(lit(0L), col("dv_a") + col("dv_b") - col("dv_union"))
          .as("dv_intersect"))
  }

  /** Global KMV sketch state `(h)` — the ≤k smallest distinct hashes of
    * the whole column. Mergeable: the k smallest of a UNION of state
    * rows is exactly the sketch of the concatenated inputs, which is
    * what makes the streaming store's estimates batch-equivalent.
    */
  def kmvState(df: DataFrame, valueCol: String, k: Int = 256): DataFrame = {
    requireK(k)
    val minK = udaf(new MinKAggregator(k))
    df.select(md5Hash52(col(valueCol)).as("h"))
      .filter(col("h").isNotNull)
      .agg(minK(col("h")).as("hs"))
      .select(explode(col("hs")).as("h"))
  }

  /** Collapse unioned state rows (`h` column) back to one ≤k-row state —
    * the compaction step of a sketch store.
    */
  def kmvCompactState(state: DataFrame, k: Int = 256): DataFrame = {
    requireK(k)
    val minK = udaf(new MinKAggregator(k))
    state.agg(minK(col("h")).as("hs"))
      .select(explode(col("hs")).as("h"))
  }

  /** [[kmvEstimate]] over state rows (`h` column) — e.g. the union of
    * several [[kmvState]] outputs.
    */
  def kmvEstimateFromState(state: DataFrame, k: Int = 256): DataFrame = {
    requireK(k)
    val minK = udaf(new MinKAggregator(k))
    state.agg(minK(col("h")).as("hs"))
      .select(sketchCols(col("hs")): _*)
      .withColumn("dv_est", dvEst(k, col("n_state"), col("kth_hash")))
  }

  /** Exploded per-key sketch state `(key, h)` — ≤k rows per key. */
  def kmvStateRows(df: DataFrame, keyCol: String, valueCol: String,
      k: Int = 256): DataFrame = {
    requireK(k)
    val minK = udaf(new MinKAggregator(k))
    df.select(col(keyCol).as("key"), md5Hash52(col(valueCol)).as("h"))
      .filter(col("h").isNotNull)
      .groupBy(col("key")).agg(minK(col("h")).as("hs"))
      .select(col("key"), explode(col("hs")).as("h"))
  }

  /** HLL register width for precision p: the bucket is the hash's top p
    * bits, rho counts leading zeros (+1) in the remaining 52-p bits.
    */
  private def hllW(p: Int): Int = {
    require(p >= 4 && p <= 12, s"p must be in [4,12], got $p")
    52 - p
  }

  /** HyperLogLog register state: `(bucket, max_rho)` for every bucket
    * that saw a value — at most 2^p rows regardless of input size. rho
    * uses `bin()` string length for the bit length (exact in any engine;
    * no float log2 whose rounding could differ).
    */
  def hllState(df: DataFrame, valueCol: String, p: Int = 8): DataFrame =
    hllStateFromHashes(
      df.select(md5Hash52(col(valueCol)).as("h")).filter(col("h").isNotNull),
      p)

  /** [[hllState]] over an already-hashed `h` column. */
  private def hllStateFromHashes(hashes: DataFrame, p: Int): DataFrame = {
    val w = hllW(p)
    hashes
      .select(expr(s"h div ${1L << w}L").as("bucket"),
        expr(s"h % ${1L << w}L").as("rem"))
      .select(col("bucket"),
        when(col("rem") === 0, lit((w + 1).toLong))
          .otherwise(lit((w + 1).toLong) - length(bin(col("rem"))))
          .as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("max_rho"))
  }

  /** Fixed-point alpha_m in parts-per-million (the m ≥ 128 constant
    * 0.7213 / (1 + 1.079/m)) — shared verbatim with the oracle SQL.
    */
  def alphaPpm(p: Int): Long =
    math.floor(1e6 * 0.7213 / (1.0 + 1.079 / (1L << p))).toLong

  /** One-row raw HLL estimate, all exact integers: `(n_seen_buckets,
    * sum_terms, dv_raw, dv_exact)`.
    *
    * The harmonic mean stays integral: with every register term scaled
    * by 2^(w+1), `sum_terms = Σ_j 2^(w+1-M_j)` (empty buckets contribute
    * the full 2^(w+1)) is an exact ≤2^(w+1+p) integer, and
    * `dv_raw = (alphaPpm(p) * 2^(2p+w+1)) div (sum_terms * 10^6)` runs
    * in DECIMAL(38,0) before folding to BIGINT — the same DECIMAL-vs-
    * HUGEINT canonicalization the shard-manifest checksum settled on.
    * No small-range linear-counting correction here (it needs a float
    * ln); callers below ~2.5·2^p distincts should prefer KMV, which is
    * EXACT in that regime.
    *
    * `dv_exact` is the exact distinct count of the same hashes — the
    * correctness harness beside the sketch (compute is one extra
    * shuffle; drop the column in production).
    */
  def hllEstimate(df: DataFrame, valueCol: String, p: Int = 8): DataFrame = {
    val hashes = df.select(md5Hash52(col(valueCol)).as("h"))
      .filter(col("h").isNotNull)
      .localCheckpoint(true) // two consumers: state agg + exact distinct
    val exact = hashes.agg(countDistinct(col("h")).as("dv_exact"))
    hllEstimateFromState(hllStateFromHashes(hashes, p), p).crossJoin(exact)
  }

  /** Per-key HLL register state — `(key, bucket, max_rho)`, at most
    * groups × 2^p rows whatever the input size. The per-key sketch a
    * 100 TB pipeline keeps per source/shard/day and merges on demand.
    */
  def hllStatePerKey(df: DataFrame, keyCol: String, valueCol: String,
      p: Int = 8): DataFrame = {
    val w = hllW(p)
    df.select(col(keyCol).cast(StringType).as("key"),
        md5Hash52(col(valueCol)).as("h"))
      .filter(col("h").isNotNull)
      .select(col("key"), expr(s"h div ${1L << w}L").as("bucket"),
        expr(s"h % ${1L << w}L").as("rem"))
      .select(col("key"), col("bucket"),
        when(col("rem") === 0, lit((w + 1).toLong))
          .otherwise(lit((w + 1).toLong) - length(bin(col("rem"))))
          .as("rho"))
      .groupBy(col("key"), col("bucket")).agg(max(col("rho")).as("max_rho"))
  }

  /** Distinct-count rollup from MERGED sketches: per-key estimates plus
    * an `<all>` row whose registers are the per-bucket MAX over the
    * per-key states — the merge runs on ≤ groups × 2^p register rows,
    * never a corpus rescan. HLL merge IS register max (associative,
    * idempotent), so the merged state is bit-identical to a
    * whole-corpus [[hllState]] — which is what makes the rollup
    * oracle-checkable exactly, and what makes the sketch shippable:
    * per-shard states union-merge into any grouping after the fact.
    * Output `(key, n_seen_buckets, sum_terms, dv_raw)`, the
    * [[hllEstimateFromState]] integer arithmetic per key.
    */
  def hllRollup(df: DataFrame, keyCol: String, valueCol: String,
      p: Int = 8): DataFrame = {
    // sentinel-collision guard (r12 advice): a REAL key that stringifies
    // to "<all>" would silently merge with the rollup row, double-counting
    // it. raise_error is codegen'd and distributed — zero cost unless the
    // collision actually occurs, in which case the job fails loud instead
    // of emitting a wrong rollup.
    val guarded = hllStatePerKey(df, keyCol, valueCol, p)
      .withColumn("key",
        when(col("key") === "<all>", raise_error(lit(
          "hllRollup: input key stringifies to the reserved rollup " +
            "sentinel \"<all>\" — rename or re-encode the key")))
          .otherwise(col("key")))
    val states = guarded
      .localCheckpoint(true) // two consumers: per-key rows + the merge
    val merged = states.groupBy(col("bucket"))
      .agg(max(col("max_rho")).as("max_rho"))
      .select(lit("<all>").as("key"), col("bucket"), col("max_rho"))
    estimateByKey(states.unionByName(merged), p)
  }

  /** [[hllEstimateFromState]] grouped by a `key` column. */
  private def estimateByKey(states: DataFrame, p: Int): DataFrame = {
    val w = hllW(p)
    val m = 1L << p
    val numer = (BigInt(alphaPpm(p)) * (BigInt(1) << (2 * p + w + 1))).toString
    states.groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_seen_buckets"),
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - max_rho)")),
          lit(0L)).as("s_seen"))
      .select(col("key"), col("n_seen_buckets"),
        (col("s_seen") +
          (lit(m) - col("n_seen_buckets")) * lit(1L << (w + 1)))
          .as("sum_terms"))
      .select(col("key"), col("n_seen_buckets"), col("sum_terms"),
        expr(s"CAST(CAST('$numer' AS DECIMAL(38,0)) div " +
          s"(CAST(sum_terms AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("dv_raw"))
  }

  /** The estimate from `(bucket, max_rho)` register rows — e.g. the
    * per-bucket max over several [[hllState]] outputs (HLL merges by
    * max, exactly): `(n_seen_buckets, sum_terms, dv_raw)`.
    */
  def hllEstimateFromState(state: DataFrame, p: Int): DataFrame = {
    val w = hllW(p)
    val m = 1L << p
    val numer = (BigInt(alphaPpm(p)) * (BigInt(1) << (2 * p + w + 1))).toString
    state.agg(
        count(lit(1)).as("n_seen_buckets"),
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - max_rho)")),
          lit(0L)).as("s_seen"))
      .select(col("n_seen_buckets"),
        (col("s_seen") +
          (lit(m) - col("n_seen_buckets")) * lit(1L << (w + 1)))
          .as("sum_terms"))
      .select(col("n_seen_buckets"), col("sum_terms"),
        expr(s"CAST(CAST('$numer' AS DECIMAL(38,0)) div " +
          s"(CAST(sum_terms AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("dv_raw"))
  }
}
