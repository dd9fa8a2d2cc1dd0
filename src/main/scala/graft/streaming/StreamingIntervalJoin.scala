package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the real-time face of the
  * batch range join (`q_range_join`): each left event (a purchase)
  * joins the right events (views) by the same key in the strictly
  * preceding `lookback` window, the classic streaming attribution
  * shape.
  *
  * Scale design: this is Spark's native stream-stream inner join —
  * both sides are hash-partitioned by the join key across executors,
  * and the time-range predicate plus BOTH watermarks bound the join
  * state: a buffered right row is dropped once the left watermark
  * passes `rightTs + lookback`, a left row once it can no longer match
  * (state cleanup is exactly the [watermark − lookback] frontier, so
  * retained state ≈ lookback-window's worth of rows per side, not the
  * stream's history). Inner-join matches emit as soon as both rows
  * have arrived — output needs no watermark flush; the watermark only
  * gates state eviction.
  *
  * Deterministic output CONTENT (the emitted row set equals the batch
  * join of the full inputs whenever no row arrives later than
  * `delayThreshold` out of order), so the registry gate replays the
  * same slice as plain SQL.
  *
  * Both inputs must carry `keyCol`; all other column names must be
  * disjoint (rename upstream — keeps the operator free of silent
  * column shadowing). Output: left columns then right columns minus
  * its join key.
  */
object StreamingIntervalJoin {

  def joinWithin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, lookback: String,
      delayThreshold: String): DataFrame = {
    val overlap = (left.columns.toSet intersect right.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: $overlap")
    val l = left.withWatermark(leftTsCol, delayThreshold).alias("l")
    val r = right.withWatermark(rightTsCol, delayThreshold).alias("r")
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col(s"r.$rightTsCol") >=
            col(s"l.$leftTsCol") - expr(s"INTERVAL $lookback") &&
          col(s"r.$rightTsCol") < col(s"l.$leftTsCol"))
      .drop(col(s"r.$keyCol"))
  }
}
