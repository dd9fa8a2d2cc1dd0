package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic negative-pair sampling for contrastive training data
  * (the retrieval/embedding-training counterpart of the curation
  * samplers in [[Stratified]]): each anchor document draws up to `k`
  * pseudo-random negatives from OUTSIDE its own group (different
  * source/domain — the standard in-batch-negatives replacement when
  * batches are assembled offline).
  *
  * Scale design (100 TB): no cross join and no global sort anywhere.
  * Candidates are hashed into `buckets` balanced buckets and ranked
  * within each (one exchange + per-bucket spillable sort, the
  * [[Stratified.sample]] shape — size `buckets` so a bucket is a few
  * hundred MB); an anchor's j-th draw computes a (bucket, slot)
  * coordinate by pure integer hashing and fetches it with ONE hash join
  * on the coordinate. Per-bucket cardinalities (`buckets` rows) ride in
  * a broadcast. Work is O(|anchors|·k + |candidates|), all shuffles
  * key-balanced by construction of the md5-derived bucket id.
  *
  * Every quantity is exact integer arithmetic off the portable 52-bit
  * md5 hash (`('0x' || substr(md5(id), 20, 13))::BIGINT` in any ANSI
  * engine), so a relational oracle reproduces the exact pair set —
  * no RNG state, re-runs and backfills draw identical negatives.
  *
  * Self-pairs and same-group draws are filtered AFTER the fetch, so an
  * anchor may end up with fewer than `k` negatives (deterministically
  * so — the trade for keeping the draw a pure hash join; callers
  * needing exactly-k re-draw the shortfall with a shifted salt).
  */
object Contrastive {

  /** Portable 52-bit hash of a column's UTF-8 string image (fits a
    * double-free BIGINT range; same definition as [[Stratified]]'s).
    */
  private def h52(c: Column): Column =
    conv(substring(md5(to_binary(c.cast("string"), lit("utf-8"))), 20, 13),
      16, 10).cast(LongType)

  /** Knuth's 2^32 golden-ratio multiplier decorrelates the j-th draw's
    * bucket from the anchor hash; the slot stride is a distinct prime so
    * bucket and slot sequences never lock step.
    */
  private val BucketStride = 2654435761L
  private val SlotStride = 1000003L

  /** Output: `(anchor_id, j, neg_id, neg_group)` — for each anchor row
    * and draw index `j ∈ [1, k]`, the sampled negative and its group;
    * rows whose draw landed on the anchor itself or inside the anchor's
    * group are absent.
    */
  def negativePairs(docs: DataFrame, idCol: String, groupCol: String,
      k: Int, buckets: Int = 64): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    require(buckets >= 1 && buckets <= (1 << 20),
      s"buckets must be in [1,2^20], got $buckets")
    val cand = docs
      .select(col(idCol).cast(LongType).as("neg_id"),
        col(groupCol).as("neg_group"))
      .withColumn("h", h52(col("neg_id")))
      .withColumn("bucket", pmod(col("h"), lit(buckets.toLong)))
    val rw = Window.partitionBy("bucket")
      .orderBy(col("h").asc, col("neg_id").asc)
    val ranked = cand
      .withColumn("slot", row_number().over(rw).cast(LongType))
      .select(col("bucket"), col("slot"), col("neg_id"), col("neg_group"))
    val cnts = ranked.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val picks = docs
      .select(col(idCol).cast(LongType).as("anchor_id"),
        col(groupCol).as("anchor_group"))
      .withColumn("ah", h52(col("anchor_id")))
      .withColumn("j", explode(array((1 to k).map(j => lit(j.toLong)): _*)))
      .withColumn("bucket",
        pmod(col("ah") + col("j") * lit(BucketStride), lit(buckets.toLong)))
      .join(broadcast(cnts), Seq("bucket"))
      .withColumn("slot",
        lit(1L) + pmod(expr("ah div 997") + col("j") * lit(SlotStride),
          col("cnt")))
    picks
      .join(ranked, Seq("bucket", "slot"))
      .filter(col("neg_id") =!= col("anchor_id") &&
        col("neg_group") =!= col("anchor_group"))
      .select(col("anchor_id"), col("j"), col("neg_id"), col("neg_group"))
  }
}
