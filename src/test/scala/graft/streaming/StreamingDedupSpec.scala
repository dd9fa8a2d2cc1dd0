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
}
