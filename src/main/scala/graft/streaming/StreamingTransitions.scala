package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-order transition pairs — the unbounded-stream face
  * of [[graft.operators.EventAnalytics.transitionMatrix]]: per user,
  * each arriving event pairs with the PREVIOUS one, including across
  * micro-batch boundaries, which is exactly the state a batch window
  * cannot carry. One `LastEvent` row per user lives in the state store
  * (`flatMapGroupsWithState`, append mode); emitted pairs feed the same
  * count/normalize aggregation the batch face runs.
  *
  * Ordering contract: within a micro-batch a user's rows are sorted by
  * `(us, event_id)` before chaining, and batches must arrive in
  * non-decreasing event time per user (the gate harness replays
  * time-ordered batches; a production deployment would front this with
  * a watermarked sort-within-delay buffer). State is bounded by user
  * cardinality — one compact row each, no TTL needed for the gate; add
  * `GroupStateTimeout` eviction when keys churn unboundedly.
  */
object StreamingTransitions {

  case class Event(user_id: Long, us: Long, event_id: Long,
      event_type: String)

  case class LastEvent(us: Long, event_id: Long, event_type: String)

  case class Transition(user_id: Long, from_type: String, to_type: String,
      from_us: Long, to_us: Long)

  /** Consecutive `(from_type, to_type)` pairs per user over a streaming
    * (or batch) frame with columns `(user_id, us, event_id,
    * event_type)`.
    */
  def pairs(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[LastEvent]) =>
          val batch = it.toSeq.sortBy(e => (e.us, e.event_id))
          val carried = state.getOption
            .map(l => Event(user, l.us, l.event_id, l.event_type)).toSeq
          val chain = carried ++ batch
          val out = chain.sliding(2).collect {
            case Seq(a, b) =>
              Transition(user, a.event_type, b.event_type, a.us, b.us)
          }.toSeq
          batch.lastOption.foreach(e =>
            state.update(LastEvent(e.us, e.event_id, e.event_type)))
          out.iterator
      }
  }
}
