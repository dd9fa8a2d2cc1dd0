package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time session aggregation over `session_window` — the native
  * Structured Streaming sessionization beside [[graft.operators
  * .Sessionize]]'s batch window formulation (reference analog: the
  * polling loop's per-company event grouping, `secedgar/core/daily.py`).
  *
  * The batch operator assigns per-event `session_seq` with a lag +
  * running sum — exact, but inherently offline: it needs the whole key
  * history sorted. `session_window` instead keeps per-key OPEN-SESSION
  * state that merges on overlap, so an unbounded stream emits each
  * session exactly once, when the event-time watermark passes its close
  * (start = min event ts, end = max event ts + gap — the same sessions
  * the batch rule produces, proven in StreamingSessionizeSpec and, on
  * the batch face, by `q_session_window`'s gap-SQL oracle).
  *
  * Scale design: state is per OPEN session (key cardinality-bounded,
  * watermark-expired), not per event; the shuffle partitions by key.
  * Append mode means downstream sinks see only finalized sessions —
  * no retraction handling.
  */
object StreamingSessionize {

  /** Finalized sessions `(key, session_start, session_end, n_events,
    * min_event, max_event)` for a streaming OR batch event frame.
    *
    * `tsCol` must be a TimestampType column; `gap` and `watermarkDelay`
    * are duration strings ("6 hours"). On a batch frame the watermark is
    * a no-op and every session is final; on a stream run it in APPEND
    * output mode — sessions surface once the watermark passes
    * `session_end`.
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      eventCol: String, gap: String,
      watermarkDelay: String = "0 seconds"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col(eventCol)).as("min_event"),
        max(col(eventCol)).as("max_event"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("min_event"), col("max_event"))
}
