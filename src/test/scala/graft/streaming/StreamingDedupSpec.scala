package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("duplicates are detected across micro-batches; first arrival is " +
    "the keeper, later copies become audit rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.dedupStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: 'a' twice (3 is an in-batch dup of 1), 'b' once
      in.addData((1L, "a"), (2L, "b"), (3L, "a"))
      q.processAllAvailable()
      // batch 2: 'a' again (cross-batch dup), 'c' new
      in.addData((4L, "a"), (5L, "c"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT id, isFirst, nSeenSoFar FROM dedup_out ORDER BY id")
        .as[(Long, Boolean, Long)].collect().toSeq
      assert(rows == Seq(
        (1L, true, 1L), // keeper of 'a'
        (2L, true, 1L), // keeper of 'b'
        (3L, false, 2L), // in-batch dup of 'a'
        (4L, false, 3L), // cross-batch dup of 'a' — state remembered it
        (5L, true, 1L))) // keeper of 'c'
    } finally q.stop()
  }

  test("dedupWithinHorizon: in-horizon copies drop, state evicts past " +
    "the watermark so late re-arrivals are admitted again") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val q = StreamingDedup.dedupWithinHorizon(
      in.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
      horizon = "10 minutes")
      .writeStream.format("memory").queryName("horizon_out")
      .outputMode("append").start()
    try {
      // batch 1: 'a' kept, in-batch copy dropped
      in.addData((1L, ts(0), "a"), (2L, ts(1), "a"), (3L, ts(1), "b"))
      q.processAllAvailable()
      // batch 2: copy of 'a' inside the horizon → dropped; watermark
      // advances to 5-10=never mind, max event time 5 − 10min < 0
      in.addData((4L, ts(5), "a"))
      q.processAllAvailable()
      // batch 3: push watermark far past the 'a' entry (t=40 − 10min =
      // t=30 > t=0..5), evicting its state...
      in.addData((5L, ts(40), "c"))
      q.processAllAvailable()
      // ...so batch 4's re-arrival of 'a' is admitted as new
      in.addData((6L, ts(41), "a"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM horizon_out ORDER BY id")
        .as[Long].collect().toSeq
      assert(ids == Seq(1L, 3L, 5L, 6L),
        s"expected first-arrivals 1,3,5 plus post-eviction re-arrival 6, got $ids")
    } finally q.stop()
  }

  test("dedup state survives a stop/restart from checkpoint: a post-" +
    "restart copy of pre-restart content is flagged as a dup, not a keeper") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_ckpt").toString
    val in = MemoryStream[(Long, String)]
    // foreachBatch (unlike the memory sink) supports checkpoint recovery
    def start() = StreamingDedup.dedupStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingDedup.DedupOut],
          _: Long) =>
        batch.collect().foreach(RestartSinkLog.rows.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    RestartSinkLog.rows.clear()
    val q1 = start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(RestartSinkLog.rows.size() == 2)
    RestartSinkLog.rows.clear()
    // restart from the same checkpoint — only post-recovery batches land
    // in the (cleared) log
    val q2 = start()
    try {
      in.addData((3L, "a"), (4L, "c"))
      q2.processAllAvailable()
      val rows = RestartSinkLog.rows.toArray(Array.empty[StreamingDedup.DedupOut])
        .sortBy(_.id).map(r => (r.id, r.isFirst, r.nSeenSoFar)).toSeq
      // id 3 duplicates pre-restart content 'a': only recovered state can
      // know that (isFirst=false, second sighting); id 4 is genuinely new
      assert(rows == Seq((3L, false, 2L), (4L, true, 1L)))
    } finally q2.stop()
  }
}

/** Shared across local-mode tasks (single test JVM). */
object RestartSinkLog extends Serializable {
  val rows =
    new java.util.concurrent.ConcurrentLinkedQueue[StreamingDedup.DedupOut]()
}
