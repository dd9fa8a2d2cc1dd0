package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for the 100 TB tier.
  *
  * First resort is AQE (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default), which splits oversized sort-merge partitions at runtime; and
  * map-side partial aggregation, which already flattens count/sum skew.
  * These helpers cover the cases AQE does not reach:
  *
  *   - [[saltedJoin]]: an equi-join whose key distribution is so hot that
  *     even a split partition exceeds an executor (the viral-CIK /
  *     boilerplate-document case). The hot side's key is salted with a
  *     deterministic bucket; the other side is replicated `buckets`
  *     times. Results are identical to the plain join, cost is a
  *     `buckets`× replication of the (smaller) right side.
  *
  * (Salting a `distinct`/`groupBy count` is deliberately absent: those are
  * aggregates, and map-side partial aggregation already collapses hot
  * keys before the shuffle.)
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of the row's salt source
    * column (use a high-cardinality column; never rand(), which breaks
    * retries and resume).
    */
  def saltCol(src: Column, buckets: Int): Column =
    pmod(xxhash64(src), lit(buckets.toLong)).cast("int")

  /** Skew-safe inner equi-join on `key`: `left` (skewed, salted by
    * `saltSrc`) × `right` (replicated per bucket). Equivalent rows to
    * `left.join(right, key)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltSrc: Column, buckets: Int = 16): DataFrame = {
    val l = left.withColumn("__salt", saltCol(saltSrc, buckets))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

}
