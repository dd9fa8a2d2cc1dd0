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
