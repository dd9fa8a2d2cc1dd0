package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Sessionize

/** session_window sessionization: a session split across micro-batches
  * must merge in state and emit ONCE, finalized sessions must equal the
  * batch gap-rule sessions, and the batch face must equal the batch
  * operator's session_seq formulation event-for-event.
  */
class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("a session split across micro-batches merges and emits once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = StreamingSessionize.sessions(
      in.toDF().toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "event_id", gap = "5 minutes",
      watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // batch 1: two events of one session (gap 3 < 5 min)
      in.addData((1L, ts(0), 10L), (1L, ts(3), 11L))
      q.processAllAvailable()
      // batch 2: extends the SAME session (3→6 < 5 min) — state merge
      in.addData((1L, ts(6), 12L))
      q.processAllAvailable()
      // nothing final yet: watermark (6−1=5) < session end (6+5=11)
      assert(spark.sql("SELECT * FROM sess_out").count() == 0)
      // batch 3: a far-future event advances the watermark to 60−1=59;
      // batch 4 triggers with that watermark (wm updates BETWEEN
      // batches) and flushes the closed session (59 > end 11)
      in.addData((1L, ts(60), 13L))
      q.processAllAvailable()
      in.addData((1L, ts(61), 14L))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT user_id, session_start, session_end, n_events,
          |  min_event, max_event FROM sess_out""".stripMargin)
        .collect()
      assert(rows.length == 1) // merged across batches, emitted once
      val r = rows.head
      assert(r.getLong(0) == 1L && r.getLong(3) == 3L)
      assert(r.getTimestamp(1) == ts(0) && r.getTimestamp(2) == ts(11))
      assert(r.getLong(4) == 10L && r.getLong(5) == 12L)
    } finally q.stop()
  }

  test("streaming finalized sessions equal the batch gap-rule sessions") {
    implicit val sqlCtx = spark.sqlContext
    // three users, sessions split across batches at awkward points
    val events = Seq(
      (1L, 0, 100L), (1L, 4, 101L), (1L, 7, 102L), // u1 session A
      (1L, 30, 103L), // u1 session B
      (2L, 2, 200L), (2L, 20, 201L), (2L, 24, 202L), // u2 sessions A, B
      (3L, 5, 300L)) // u3 single event
    val in = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = StreamingSessionize.sessions(
      in.toDF().toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "event_id", gap = "5 minutes",
      // batches interleave event time non-monotonically: the delay must
      // cover the disorder or the late rows would drop
      watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("sess_par")
      .outputMode("append").start()
    try {
      val batches = events.grouped(3).toSeq
      batches.foreach { b =>
        in.addData(b.map { case (u, m, e) => (u, ts(m), e) }: _*)
        q.processAllAvailable()
      }
      // close everything: the first event raises the watermark, the
      // second triggers the batch that flushes under it
      in.addData((9L, ts(600), 999L))
      q.processAllAvailable()
      in.addData((9L, ts(601), 998L))
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT user_id, session_start, session_end, n_events
          |FROM sess_par WHERE user_id < 9""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3))).toSet
      // batch rule: session_seq via lag + running sum, then aggregate
      val batchDf = events.map { case (u, m, e) => (u, ts(m), e) }
        .toDF("user_id", "ts", "event_id")
        .withColumn("us", expr("unix_micros(ts)"))
      val agg = Sessionize.sessionize(batchDf, Seq("user_id"), "us",
        gap = 5L * 60 * 1000000)
        .groupBy("user_id", "session_seq")
        .agg(expr("timestamp_micros(min(us))").as("session_start"),
          expr("timestamp_micros(max(us) + 300000000)").as("session_end"),
          expr("CAST(count(*) AS BIGINT)").as("n_events"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(2),
          r.getTimestamp(3), r.getLong(4))).toSet
      assert(streamed == agg)
    } finally q.stop()
  }

  test("batch face: session_window equals the session_seq formulation") {
    val events = Seq(
      (1L, 0, 1L), (1L, 2, 2L), (1L, 9, 3L), (1L, 11, 4L),
      (2L, 0, 5L), (2L, 30, 6L))
      .map { case (u, m, e) => (u, ts(m), e) }
      .toDF("user_id", "ts", "event_id")
    val viaWindow = StreamingSessionize.sessions(
      events, "user_id", "ts", "event_id", gap = "5 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).toSet
    val viaSeq = Sessionize.sessionize(
      events.withColumn("us", expr("unix_micros(ts)")),
      Seq("user_id"), "us", gap = 5L * 60 * 1000000)
      .groupBy("user_id", "session_seq")
      .agg(expr("timestamp_micros(min(us))").as("s"),
        expr("timestamp_micros(max(us) + 300000000)").as("e"),
        expr("CAST(count(*) AS BIGINT)").as("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4))).toSet
    assert(viaWindow == viaSeq)
    assert(viaWindow.size == 4) // u1 splits at the 7-minute gap; u2 splits
  }
}
