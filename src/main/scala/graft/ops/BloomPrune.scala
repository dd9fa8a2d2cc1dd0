package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning for big⋈small joins at the 100 TB tier.
  *
  * The classic pattern: when the small side of an equi-join is selective
  * (a filtered dimension, an allowlist, an eval set), shuffling the full
  * fact side just to drop most of it on the reducer is wasted I/O. Build
  * a Bloom filter over the small side's keys (one tiny job), broadcast it
  * to every scan task, and filter the fact side BEFORE its shuffle. The
  * filter has no false negatives, so the subsequent real join re-verifies
  * the false positives and the result is bit-identical to the plain join
  * — only cheaper: the exchange carries ~(selectivity + fpp) of the rows.
  *
  * Catalyst's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does this
  * automatically for some shapes; this operator is the explicit form for
  * when the optimizer cannot see the selectivity (pre-filtered DataFrames
  * built in code, a filter reused across several joins, or keys collected
  * once and applied to many scans).
  */
object BloomPrune {

  /** Build a Bloom filter over `small`'s `smallKey` (long-castable)
    * column and return a pruning predicate over `probeCol`. The sketch
    * is broadcast once; the probe is a UDF (the sketch has no Column
    * form) sitting in FRONT of the exchange, so the codegen break costs
    * one virtual call per row against a shuffle write saved per pruned
    * row.
    */
  def keyFilter(small: DataFrame, smallKey: String, probeCol: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): Column = {
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = small.sparkSession.sparkContext.broadcast(bf)
    val probe = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    probe(probeCol.cast("long"))
  }

  /** Inner equi-join `large ⋈ small ON largeKey = smallKey`, with the
    * large side Bloom-pruned before its shuffle. Row-identical to the
    * plain join (no false negatives; false positives are re-verified by
    * the join itself).
    */
  def bloomPrunedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    large
      .filter(keyFilter(small, smallKey, col(largeKey), expectedItems, fpp))
      .join(small, col(largeKey) === col(smallKey))
}
