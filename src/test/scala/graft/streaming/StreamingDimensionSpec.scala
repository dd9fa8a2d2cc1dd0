package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Warehouse

/** Streaming SCD2: cross-batch version chains, parity with the batch
  * merge applied sequentially, and replay idempotence of a snapshot.
  */
class StreamingDimensionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dim0 = Seq(
    (1L, "a0", 10L, Option.empty[Long]),
    (2L, "b0", 10L, Option.empty[Long])
  ).toDF("k", "attr", "valid_from", "valid_to")

  test("micro-batch updates chain versions across batches") {
    val dir = java.nio.file.Files.createTempDirectory("sdim").toString
    StreamingDimension.initDim(dim0, s"$dir/dim")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = StreamingDimension.attach(in.toDF().toDF("k", "attr", "ts"),
      s"$dir/dim", "k", Seq("attr"), "ts", s"$dir/ckpt")(_ => ())
    try {
      // batch 0: key 1 changes (intra-batch churn: ts 19 loses to ts 20)
      in.addData((1L, "a-noise", 19L), (1L, "a1", 20L))
      q.processAllAvailable()
      // batch 1: key 1 changes again, key 3 first seen
      in.addData((1L, "a2", 30L), (3L, "c0", 30L))
      q.processAllAvailable()
    } finally q.stop()
    val hist = StreamingDimension.latest(spark, s"$dir/dim")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(hist.toSeq == Seq(
      (1L, "a0", 10L, Some(20L)),
      (1L, "a1", 20L, Some(30L)),
      (1L, "a2", 30L, None),
      (2L, "b0", 10L, None),
      (3L, "c0", 30L, None)))
    // parity: the same merges applied as plain batch calls
    val expect = Warehouse.scd2Merge(
      Warehouse.scd2Merge(dim0, Seq((1L, "a1", 20L)).toDF("k", "attr", "ts"),
        "k", Seq("attr"), "ts"),
      Seq((1L, "a2", 30L), (3L, "c0", 30L)).toDF("k", "attr", "ts"),
      "k", Seq("attr"), "ts")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(hist.toSeq == expect.toSeq)
  }

  test("compact keeps the newest snapshots; latest() unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("sdimc").toString
    StreamingDimension.initDim(dim0, s"$dir/dim")
    StreamingDimension.processBatch(
      Seq((1L, "a1", 20L)).toDF("k", "attr", "ts"),
      0L, s"$dir/dim", "k", Seq("attr"), "ts")
    StreamingDimension.processBatch(
      Seq((1L, "a2", 30L)).toDF("k", "attr", "ts"),
      1L, s"$dir/dim", "k", Seq("attr"), "ts")
    val before = StreamingDimension.latest(spark, s"$dir/dim")
      .orderBy("k", "valid_from").collect().map(_.toString).toSeq
    StreamingDimension.compact(spark, s"$dir/dim", keepLast = 1)
    val snaps = spark.read.parquet(s"$dir/dim")
      .select(col("snap").cast("long")).distinct().collect()
      .map(_.getLong(0)).sorted
    assert(snaps.toSeq == Seq(1L))
    val after = StreamingDimension.latest(spark, s"$dir/dim")
      .orderBy("k", "valid_from").collect().map(_.toString).toSeq
    assert(after == before)
  }

  test("replaying a batch rebuilds the same snapshot (no double-close)") {
    val dir = java.nio.file.Files.createTempDirectory("sdimr").toString
    StreamingDimension.initDim(dim0, s"$dir/dim")
    val upd = Seq((1L, "a1", 20L)).toDF("k", "attr", "ts")
    def snap() = StreamingDimension.processBatch(upd, 0L, s"$dir/dim",
      "k", Seq("attr"), "ts")
      .orderBy("k", "valid_from")
      .collect().map(_.toString).toSeq
    val first = snap()
    val replay = snap() // same batchId: reads snap=-1 again, overwrites
    assert(first == replay)
    assert(StreamingDimension.latest(spark, s"$dir/dim")
      .filter(col("k") === 1L).count() == 2) // exactly two versions
  }
}
