package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq((0L, "a" * 2500), (1L, "short doc"))
    .toDF("doc_id", "text")

  test("attachBinary: opaque bytes + typed metadata struct") {
    val m = Multimodal.attachBinary(docs, "doc_id", "text", "text/plain")
    val r = m.filter($"id" === 0L).head()
    val meta = r.getStruct(r.fieldIndex("media_meta"))
    assert(meta.getAs[String]("mime") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") == 2500L)
    assert(meta.getAs[String]("digest").length == 32)
  }

  test("frameSample explodes payload into fixed-size chunks") {
    val frames = Multimodal.frameSample(
      Multimodal.attachBinary(docs, "doc_id", "text"), chunkBytes = 1024)
    val counts = frames.groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts(0L) == 3) // 2500 bytes -> 3 chunks
    assert(counts(1L) == 1)
    val sizes = frames.filter($"id" === 0L)
      .select(length($"frame")).as[Int].collect().sorted
    assert(sizes.toSeq == Seq(452, 1024, 1024))
  }

  test("decodeAndFeaturize (stub codec): deterministic normalized features") {
    val feats = Multimodal.decodeAndFeaturize(
      Multimodal.attachBinary(docs, "doc_id", "text"), dim = 16)
    val f = feats.filter($"id" === 0L).select("features")
      .as[Seq[Float]].head()
    assert(f.size == 16)
    assert(math.abs(f.sum - 1.0f) < 1e-4) // L1 normalized
    // deterministic: same input -> same features
    val f2 = Multimodal.decodeAndFeaturize(
      Multimodal.attachBinary(docs, "doc_id", "text"), dim = 16)
      .filter($"id" === 0L).select("features").as[Seq[Float]].head()
    assert(f == f2)
  }
}
