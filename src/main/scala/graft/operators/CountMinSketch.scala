package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the scale path for
  * frequency estimation where an exact `groupBy(value).count()` would
  * shuffle every distinct value: token/n-gram/domain frequencies over a
  * 100 TB corpus in one pass with d×m-bounded state, point estimates
  * with the one-sided guarantee `est ≥ true` (and `est ≤ true + εN`
  * w.h.p. for m = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  *
  * The d hash rows come from the engine-portable seeded md5-52 family
  * (`h_i(x) = md5("i|" ++ x)[52-bit] % m` — DuckDB reproduces it as
  * `('0x' || substr(md5(i || '|' || x), 20, 13))::BIGINT % m`), and
  * every emitted number is an exact integer count — no floats anywhere —
  * so the oracle checks the sketch STATE and the ESTIMATES bit-for-bit.
  *
  * Scale design: the state build is one explode(d) + groupBy whose
  * map-side partial collapses to ≤ d×m cells per task, so the shuffle is
  * O(tasks × d × m), independent of corpus size. Estimation broadcasts
  * the (≤ d×m rows) state into the probe stream — probes shuffle once on
  * the probe key, never the corpus. The state is MERGEABLE by plain
  * per-cell addition (counts are additive), which is what makes the
  * streaming store's estimates batch-equivalent, and exactly why CMS —
  * unlike a heap-backed heavy-hitter summary — can be maintained
  * per-partition and per-micro-batch with no resummarization error.
  * Heavy-hitter HUNTING still needs a candidate stream (the sketch
  * cannot enumerate keys): pair with [[FrequentItems]]' Misra-Gries
  * candidates and refine their counts here.
  */
object CountMinSketch {

  private def requireDims(d: Int, m: Int): Unit = {
    require(d >= 1 && d <= 8, s"depth d must be in [1,8], got $d")
    require(m >= 2 && m <= (1 << 20), s"width m must be in [2,2^20], got $m")
  }

  /** Row-seeded 52-bit md5 bucket, portable across engines. */
  private def rowBucket(rowId: Int, c: Column, m: Int): Column =
    pmod(
      conv(substring(md5(to_binary(concat(lit(s"$rowId|"), c),
        lit("utf-8"))), 20, 13), 16, 10).cast(LongType),
      lit(m.toLong))

  /** The d (row_id, bucket) cells of one value. */
  private def cells(valueCol: Column, d: Int, m: Int): Column =
    array((0 until d).map(i =>
      struct(lit(i.toLong).as("row_id"),
        rowBucket(i, valueCol, m).as("bucket"))): _*)

  /** Build the sketch: `(row_id, bucket, cnt)` — at most d×m rows
    * regardless of input size, only cells that saw a value (absent cell
    * ≡ count 0). Null values are skipped (they have no frequency).
    */
  def cmsState(df: DataFrame, valueCol: String, d: Int = 4,
      m: Int = 1024): DataFrame = {
    requireDims(d, m)
    df.filter(col(valueCol).isNotNull)
      .select(explode(cells(col(valueCol), d, m)).as("rb"))
      .select(col("rb.row_id").as("row_id"), col("rb.bucket").as("bucket"))
      .groupBy(col("row_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge state fragments (e.g. per-batch sketches of a store) back to
    * one canonical state: per-cell addition — EXACTLY the sketch of the
    * concatenated inputs, the mergeability that powers the streaming
    * face.
    */
  def cmsMergeState(state: DataFrame): DataFrame =
    state.groupBy(col("row_id"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Join-size estimate from two sketches over the SAME (d, m, hash)
    * family: `est = min_i Σ_b cntA[i,b]·cntB[i,b]` — the Count-Min
    * inner-product estimator (Cormode & Muthukrishnan 2005 §4.2).
    * `Σ_k fA(k)·fB(k)` is EXACTLY the row count of the equi-join
    * `A ⋈_k B`, and hash collisions only ever ADD cross terms, so the
    * estimate is one-sided: `est ≥ true join size` (within εN_A·N_B
    * w.h.p.). Estimating with itself gives the second moment F2 = the
    * self-join size, the skew diagnostic.
    *
    * The whole computation runs over the two ≤ d×m states — join-size
    * planning for a 100 TB join costs two single-pass sketches and a
    * d×m-row join, never the join itself. Output: one row `(est)`.
    * Absent cells are zeros, so rows pair through an inner join — but a
    * row with NO overlapping cells has dot 0 and must still vote, hence
    * the row-id spine (an inner-join-only min would overestimate).
    */
  def cmsInnerProduct(stateA: DataFrame, stateB: DataFrame,
      d: Int): DataFrame = {
    requireDims(d, 2)
    val dots = stateA
      .select(col("row_id"), col("bucket"), col("cnt").as("cnt_a"))
      .join(stateB.select(col("row_id"), col("bucket"),
        col("cnt").as("cnt_b")), Seq("row_id", "bucket"))
      .groupBy(col("row_id"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("dot"))
    stateA.sparkSession.range(d).toDF("row_id")
      .join(dots, Seq("row_id"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est"))
  }

  /** Point estimates for a probe set: `(probe, est)` with
    * `est = min_i cnt[i, h_i(probe)]` — never below the true count, and
    * 0 for values the sketch never saw in a row. The state (≤ d×m rows)
    * broadcasts; probes shuffle once on the probe key for the d-row min.
    */
  def cmsEstimate(state: DataFrame, probes: DataFrame, probeCol: String,
      d: Int = 4, m: Int = 1024): DataFrame = {
    requireDims(d, m)
    probes.filter(col(probeCol).isNotNull)
      .select(col(probeCol).as("probe"),
        explode(cells(col(probeCol), d, m)).as("rb"))
      .select(col("probe"), col("rb.row_id").as("row_id"),
        col("rb.bucket").as("bucket"))
      .join(broadcast(state), Seq("row_id", "bucket"), "left")
      .groupBy(col("probe"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
