package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming strict-order funnel — the unbounded-stream face of
  * [[graft.operators.EventAnalytics.funnel]]: each user's earliest
  * completion chain (`t_i` = min ts of step i STRICTLY after
  * `t_{i-1}`) advances incrementally as events arrive, including across
  * micro-batch boundaries. Per-user state is the k-slot chain plus a
  * monotone version counter (`mapGroupsWithState` shape via
  * `flatMapGroupsWithState`, append mode): each micro-batch a user
  * appears in emits one snapshot, and the reader keeps the
  * highest-version row per user — so the final table equals the batch
  * funnel bit-for-bit (a gate proves it against the batch oracle).
  *
  * Greedy-equivalence note: within one timestamp the processing order
  * of different steps cannot change the chain (setting `t_i` requires
  * `t_{i-1}` STRICTLY earlier, so same-instant events can neither
  * enable nor steal each other's slots), which is why the per-batch
  * `(us, event_id)` sort and the batch operator's `(us, step)` sort
  * produce identical chains. Batches must arrive in non-decreasing
  * event time per user (same harness contract as
  * [[StreamingTransitions]]). State is one compact row per user; add
  * `GroupStateTimeout` eviction when keys churn unboundedly.
  */
object StreamingFunnel {

  case class Event(user_id: Long, us: Long, event_id: Long,
      event_type: String)

  /** `ts(i)` = Long.MinValue while step i+1 is unreached. */
  case class FunnelState(version: Long, ts: Seq[Long])

  case class Snapshot(user_id: Long, version: Long, depth: Long,
      ts: Seq[Long])

  private val Unset = Long.MinValue

  /** Per-user funnel snapshots over a streaming (or batch) frame with
    * columns `(user_id, us, event_id, event_type)`; keep the max
    * `version` row per user for the current chain.
    */
  def chains(events: DataFrame, steps: Seq[String]): Dataset[Snapshot] = {
    require(steps.nonEmpty && steps.size <= 8,
      s"steps must be 1..8, got ${steps.size}")
    val spark = events.sparkSession
    import spark.implicits._
    val k = steps.size
    val stepIdx = steps.zipWithIndex.toMap
    events.as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          val batch = it.toSeq.sortBy(e => (e.us, e.event_id))
          val st = state.getOption
            .getOrElse(FunnelState(0L, Seq.fill(k)(Unset)))
          val ts = st.ts.toArray
          batch.foreach { e =>
            stepIdx.get(e.event_type).foreach { i =>
              if (ts(i) == Unset &&
                  (i == 0 || (ts(i - 1) != Unset && e.us > ts(i - 1))))
                ts(i) = e.us
            }
          }
          val ns = FunnelState(st.version + 1, ts.toSeq)
          state.update(ns)
          // slots fill prefix-first, so depth = count of set slots
          val depth = ts.count(_ != Unset).toLong
          Iterator.single(Snapshot(user, ns.version, depth, ts.toSeq))
      }
  }
}
