package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Cross-batch streaming exact dedup — the streaming face of
  * [[graft.operators.Dedup.exactDedup]] for a continuously-arriving
  * corpus (the training-data-pipeline case: filings / documents landing
  * over days, duplicates across batches).
  *
  * `flatMapGroupsWithState` keyed by content hash: state per distinct
  * content is one (keeper_id, n_seen) pair; the first-ever arrival is
  * flagged `is_first` (the keeper), later arrivals stream out as audit
  * rows instead of disappearing — the batch operator's "lowest id wins"
  * becomes "first arrival wins, ties within a micro-batch by id".
  *
  * Scale: state size is O(distinct contents) × 16 bytes; at 100 TB run
  * with the RocksDB state store and a `ProcessingTimeTimeout` TTL if the
  * dedup horizon is bounded (e.g. "dedup within 30 days").
  */
object StreamingDedup {

  case class DupState(keeperId: Long, nSeen: Long)
  case class DedupOut(id: Long, contentHash: String, isFirst: Boolean,
      nSeenSoFar: Long)

  /** Bounded-horizon streaming dedup via the engine-native
    * `dropDuplicatesWithinWatermark`: keeps the FIRST arrival per content
    * hash and drops later copies whose event time lands within the
    * watermark horizon; state for a content key is evicted once the
    * watermark passes it, so state size is O(distinct contents per
    * horizon), not O(all history) — the "dedup within 30 days" contract
    * [[dedupStream]]'s Scaladoc gestures at, as a declarative operator
    * the state-store (RocksDB at scale) manages by itself.
    *
    * The trade against [[dedupStream]]: no audit rows (drops are silent)
    * and re-arrivals AFTER the horizon are admitted again — which is the
    * point: an unbounded-state exact dedup cannot run forever.
    */
  def dedupWithinHorizon(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, horizon: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("id"),
        col(tsCol).cast("timestamp").as("event_time"),
        md5(to_binary(col(textCol), lit("utf-8"))).as("ch"))
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark("ch")

  /** docs(idCol: long-castable, textCol: string) → append stream of
    * [[DedupOut]] rows, one per input doc.
    */
  def dedupStream(docs: DataFrame, idCol: String, textCol: String): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        md5(to_binary(col(textCol), lit("utf-8"))).as("ch"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[DupState, DedupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (ch, rows, state) =>
          val sorted = rows.map(_._1).toSeq.sorted
          val prior = state.getOption
          val keeper = prior.map(_.keeperId).getOrElse(sorted.head)
          var seen = prior.map(_.nSeen).getOrElse(0L)
          val out = sorted.map { id =>
            seen += 1
            DedupOut(id, ch, isFirst = prior.isEmpty && id == sorted.head, seen)
          }
          state.update(DupState(keeper, seen))
          out.iterator
      }
  }
}
