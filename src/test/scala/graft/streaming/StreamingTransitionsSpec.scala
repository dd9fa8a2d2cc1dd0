package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cross-batch LastEvent state: an event pair split across micro-batches
  * must still emit, within-batch rows chain in (us, event_id) order, and
  * independent users never interleave.
  */
class StreamingTransitionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Long, Long, String)]]) = {
    implicit val sqlCtx = spark.sqlContext
    spark.catalog.dropTempView("trans_out")
    val in = MemoryStream[(Long, Long, Long, String)]
    val q = StreamingTransitions.pairs(
      in.toDF().toDF("user_id", "us", "event_id", "event_type"))
      .toDF()
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val out = spark.sql(
      "SELECT user_id, from_type, to_type, from_us, to_us FROM trans_out")
      .as[(Long, String, String, Long, Long)].collect().toSet
    spark.catalog.dropTempView("trans_out")
    out
  }

  test("a pair split across micro-batches emits via state") {
    val got = run(Seq(
      Seq((1L, 10L, 1L, "view")),
      Seq((1L, 20L, 2L, "purchase"))))
    assert(got == Set((1L, "view", "purchase", 10L, 20L)))
  }

  test("within-batch rows chain in (us, event_id) order") {
    // delivered out of order inside one batch — the operator must sort
    val got = run(Seq(
      Seq((1L, 30L, 3L, "c"), (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"))))
    assert(got == Set(
      (1L, "a", "b", 10L, 20L), (1L, "b", "c", 20L, 30L)))
  }

  test("users never interleave; singleton users emit nothing") {
    val got = run(Seq(
      Seq((1L, 10L, 1L, "x"), (2L, 15L, 2L, "y")),
      Seq((1L, 20L, 3L, "z"))))
    assert(got == Set((1L, "x", "z", 10L, 20L)))
  }

  test("equal timestamps tie-break on event_id, across state too") {
    val got = run(Seq(
      Seq((7L, 50L, 1L, "a"), (7L, 50L, 2L, "b")),
      Seq((7L, 50L, 3L, "c"))))
    // note: batch 2's event carries the same us — the contract only
    // needs non-decreasing time, and the chain is a→b→c
    assert(got == Set(
      (7L, "a", "b", 50L, 50L), (7L, "b", "c", 50L, 50L)))
  }
}
