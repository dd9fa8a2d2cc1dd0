package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Stream-static dimension enrichment — the lookup join every event
  * pipeline runs before anything else (attach the customer/domain/dim
  * attributes to each event as it arrives).
  *
  * Semantics: LEFT join, so dimension misses pass through with nulls
  * (dropping events on a late-arriving dimension row is the classic
  * silent-loss bug); the static side is re-executed at every
  * micro-batch — NEW ROWS in already-listed dimension files are picked
  * up, but a file-backed source's listing may be cached, so a
  * dimension maintained by appending files (e.g. [[StreamingDimension]]
  * output) needs a catalog-table or periodic-restart refresh strategy.
  *
  * Scale design: the dimension is broadcast — the join is stateless
  * and shuffle-free per micro-batch (no watermark, no state store;
  * Spark plans a BroadcastHashJoin inside each batch). That is the
  * right physical shape precisely when the dimension is the small side
  * (the 100 TB stream never moves); for a dimension too big to
  * broadcast, drop the hint and let each micro-batch shuffle-join
  * against the bucketed dimension layout instead.
  */
object StreamingEnrich {

  def withDimension(stream: DataFrame, dim: DataFrame,
      cond: Column): DataFrame =
    stream.join(broadcast(dim), cond, "left")
}
