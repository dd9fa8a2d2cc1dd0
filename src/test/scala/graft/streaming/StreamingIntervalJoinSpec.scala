package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stream-stream interval join: matches must emit as micro-batches
  * drain (left row buffered until its right partner arrives and vice
  * versa), the joined set must equal the batch range join, and the
  * window bounds must be inclusive-lower / strict-upper.
  */
class StreamingIntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private def run(
      pBatches: Seq[Seq[(Long, java.sql.Timestamp, Long)]],
      vBatches: Seq[Seq[(Long, java.sql.Timestamp, Long)]]) = {
    implicit val sqlCtx = spark.sqlContext
    spark.catalog.dropTempView("ij_out")
    val inP = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val inV = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = StreamingIntervalJoin.joinWithin(
      inP.toDF().toDF("user_id", "p_ts", "p_id"),
      inV.toDF().toDF("user_id", "v_ts", "v_id"),
      "user_id", "p_ts", "v_ts",
      lookback = "10 minutes", delayThreshold = "1 hour")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try pBatches.zipAll(vBatches, Seq.empty, Seq.empty).foreach {
      case (p, v) =>
        if (p.nonEmpty) inP.addData(p: _*)
        if (v.nonEmpty) inV.addData(v: _*)
        q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT user_id, p_id, v_id FROM ij_out")
      .as[(Long, Long, Long)].collect().toSet
    spark.catalog.dropTempView("ij_out")
    out
  }

  test("cross-batch partners match; window bounds are [ts-lb, ts)") {
    val out = run(
      // purchase arrives a batch BEFORE its view partner and a batch
      // AFTER another — both directions must buffer and still match
      Seq(Seq((1L, ts(20), 100L)), Seq((2L, ts(40), 200L))),
      Seq(Seq((2L, ts(35), 20L)), Seq(
        (1L, ts(10), 10L), // exactly lookback before p: inclusive
        (1L, ts(20), 11L), // simultaneous: strict upper bound excludes
        (1L, ts(9), 12L), // just outside the window
        (3L, ts(18), 13L)))) // key with no purchase
    assert(out == Set((1L, 100L, 10L), (2L, 200L, 20L)))
  }

  test("streamed join equals the batch range join on the same rows") {
    val ps = (0 until 40).map(i =>
      (i.toLong % 5, ts(30 + i), 1000L + i))
    val vs = (0 until 60).map(i =>
      (i.toLong % 5, ts(25 + (i % 30)), 2000L + i))
    val streamed = run(ps.grouped(13).toSeq, vs.grouped(17).toSeq)
    val expected = (for {
      (pu, pt, pid) <- ps
      (vu, vt, vid) <- vs
      if pu == vu && vt.getTime >= pt.getTime - 600000L &&
        vt.getTime < pt.getTime
    } yield (pu, pid, vid)).toSet
    assert(streamed == expected && expected.nonEmpty)
  }

  test("overlapping non-key column names are refused") {
    implicit val sqlCtx = spark.sqlContext
    val inA = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val inB = MemoryStream[(Long, java.sql.Timestamp, Long)]
    intercept[IllegalArgumentException] {
      StreamingIntervalJoin.joinWithin(
        inA.toDF().toDF("user_id", "ts", "id"),
        inB.toDF().toDF("user_id", "ts", "v_id"),
        "user_id", "ts", "ts", "5 minutes", "1 hour")
    }
  }
}
