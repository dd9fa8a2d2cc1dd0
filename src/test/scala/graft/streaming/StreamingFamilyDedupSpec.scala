package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming template-family dedup: a family SEEDED by micro-batch 1 is
  * joined by micro-batch 2 (cross-batch append), bootstrap families
  * match immediately, and novel docs stay their own family.
  */
class StreamingFamilyDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cross-batch: batch 2 joins the family batch 1 seeded AND a " +
      "bootstrap family; novel docs are their own") {
    val P1 = "BOOTSTRAP-FAMILY-PHRASE!!!"
    val P3 = "STREAMED-NEW-FAMILY-BLOCK!"
    val corpus = Seq(
      (1L, "aaaaaaaaaa" + P1 + "bbbbbbbbbb"),
      (2L, "cccccccccc" + P1 + "dddddddddd"),
      (9L, "bootstrap doc in no family at all.....")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sfam").toString
    val (idxP, lblP) = (s"$dir/idx", s"$dir/lbl")
    StreamingFamilyDedup // touch object
    graft.operators.FamilyStore.init(corpus, "doc_id", "text", idxP,
      lblP, minLen = 26)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val sink = scala.collection.mutable.Map.empty[Long, Long]
    val q = StreamingFamilyDedup.attach(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idxP, lblP, minLen = 26,
      checkpointDir = s"$dir/ckpt") { f =>
      sink ++= f.select("doc_id", "family").as[(Long, Long)].collect()
    }
    try {
      in.addData(
        (100L, "eeeeeeeeee" + P3 + "ffffffffff"),
        (101L, "first batch lone text ZQXWVYU KJHGFDS"))
      q.processAllAvailable()
      assert(sink(100L) == 100L && sink(101L) == 101L,
        s"batch 1 seeds, nothing standing matches: $sink")
      in.addData(
        (200L, "gggggggggg" + P3 + "hhhhhhhhhh"),   // joins batch 1's
        (201L, "iiiiiiiiii" + P1 + "jjjjjjjjjj"),   // joins bootstrap's
        (202L, "batch-two wholly novel content here..."))
      q.processAllAvailable()
      assert(sink(200L) == 100L,
        s"cross-batch family (100 <- 200) missed: $sink")
      assert(sink(201L) == 1L, s"bootstrap family missed: $sink")
      assert(sink(202L) == 202L)
    } finally q.stop()
  }
}
