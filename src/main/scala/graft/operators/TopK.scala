package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k aggregator — the two-phase merge for similarity
  * top-k. Replaces `row_number().over(Window.partitionBy(query_id))`,
  * which shuffles every candidate row and sorts each query's entire
  * candidate set on a single reducer. Here the map-side partial
  * aggregation (ObjectHashAggregate partial → partial-merge) keeps a
  * buffer of at most 2k entries per query per task and ships only the
  * per-partition top-k, so the shuffle is O(partitions × queries × k),
  * independent of corpus size — the plan that survives a 100× scale-up.
  *
  * Entries are (sim, neighbor_id); ordering is sim desc, id asc (the
  * exact total order the window formulation used, so results hash-match).
  * Duplicate neighbor ids (a pair found via several LSH tables/probes)
  * collapse to one entry at compaction, which lets callers skip a
  * `dropDuplicates` shuffle before aggregating.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Sort best-first, collapse duplicate ids (best survives), truncate. */
  private def compact(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val seen = scala.collection.mutable.HashSet.empty[Long]
    buf.sortWith(better).iterator
      .filter(e => seen.add(e._2)).take(k).toVector
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)],
      in: (Long, Double)): Seq[(Double, Long)] = {
    val nb = b :+ ((in._2, in._1))
    // amortized O(log k) per row: compact every k inserts, not every one
    if (nb.size >= 2 * k) compact(nb) else nb
  }

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] = compact(a ++ b)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = compact(b)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
