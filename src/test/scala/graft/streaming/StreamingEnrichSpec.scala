package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stream-static enrichment: every streamed row must come out exactly
  * once, dimension hits enriched, misses preserved with nulls, across
  * micro-batch boundaries.
  */
class StreamingEnrichSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hits enrich, misses pass through with nulls, across batches") {
    implicit val sqlCtx = spark.sqlContext
    spark.catalog.dropTempView("enrich_out")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("key", "tier")
    val in = MemoryStream[(Long, Long)]
    val q = StreamingEnrich.withDimension(
      in.toDF().toDF("id", "skey"), dim, col("skey") === dim("key"))
      .select(col("id"), dim("tier"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      in.addData((10L, 1L), (11L, 3L)) // hit + miss in batch 1
      q.processAllAvailable()
      in.addData((12L, 2L), (13L, 1L)) // hits in batch 2
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT id, tier FROM enrich_out")
      .as[(Long, Option[String])].collect().toSet
    spark.catalog.dropTempView("enrich_out")
    assert(out == Set(
      (10L, Some("gold")), (11L, None),
      (12L, Some("silver")), (13L, Some("gold"))))
  }

  test("a duplicate dimension key fans out, batch-join-style") {
    implicit val sqlCtx = spark.sqlContext
    spark.catalog.dropTempView("enrich_dup")
    val dim = Seq((1L, "a"), (1L, "b")).toDF("key", "tag")
    val in = MemoryStream[(Long, Long)]
    val q = StreamingEnrich.withDimension(
      in.toDF().toDF("id", "skey"), dim, col("skey") === dim("key"))
      .select(col("id"), dim("tag"))
      .writeStream.format("memory").queryName("enrich_dup")
      .outputMode("append").start()
    try { in.addData((5L, 1L)); q.processAllAvailable() } finally q.stop()
    val out = spark.sql("SELECT id, tag FROM enrich_dup")
      .as[(Long, String)].collect().toSet
    spark.catalog.dropTempView("enrich_dup")
    assert(out == Set((5L, "a"), (5L, "b")))
  }
}
