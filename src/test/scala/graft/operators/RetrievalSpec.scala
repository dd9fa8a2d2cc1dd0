package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark shuffle partition spark shuffle data movement"),
    (2L, "spark appears once in this much longer document about " +
      "other things entirely with many additional words diluting it"),
    (3L, "cooking recipes and garden tools no relevant terms here"),
    (4L, "partition partition partition partition partition"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("docs covering more query terms outrank single-term docs; " +
    "unmatched docs absent; scores positive") {
    val r = Retrieval.bm25(docs, "doc_id", "text",
        Seq("spark", "shuffle", "partition"))
      .as[(Long, Long, Double)].collect().toSeq
    val byId = r.map(x => x._1 -> x).toMap
    assert(!byId.contains(3L) && !byId.contains(5L))
    assert(byId(1L)._2 == 3L && byId(2L)._2 == 1L && byId(4L)._2 == 1L)
    assert(r.head._1 == 1L, s"expected doc 1 first, got $r")
    assert(r.forall(_._3 > 0.0))
    // tf saturation: doc 4's five repeats of one term cannot overtake
    // doc 1's full coverage
    assert(byId(1L)._3 > byId(4L)._3)
  }

  test("scores are bitwise-identical across input partitioning (ordered " +
    "fold, not arbitrary float accumulation)") {
    val a = Retrieval.bm25(docs, "doc_id", "text", Seq("spark", "shuffle"))
      .as[(Long, Long, Double)].collect().toSeq
    val b = Retrieval.bm25(docs.repartition(7), "doc_id", "text",
      Seq("spark", "shuffle")).as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("materialized index serves bitwise-identical scores through a " +
    "partition-pruned postings scan") {
    val corpus = (1L to 200L).map { i =>
      val extra = if (i % 7 == 0) " spark shuffle" else ""
      val pad = Seq.fill((i % 13).toInt)("filler").mkString(" ")
      (i, s"document number about data processing $pad$extra")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString + "/idx"
    Retrieval.writeBm25Index(corpus, "doc_id", "text", dir, nBuckets = 16)
    val adhoc = Retrieval.bm25(corpus, "doc_id", "text",
      Seq("spark", "shuffle", "filler"), topN = 50)
      .as[(Long, Long, Double)].collect().toSeq
    val served = Retrieval.bm25FromIndex(spark, dir,
      Seq("spark", "shuffle", "filler"), topN = 50, nBuckets = 16)
      .as[(Long, Long, Double)].collect().toSeq
    assert(adhoc == served) // bitwise, including the double scores
    // the postings scan must carry a static partition filter on tb
    val plan = Retrieval.bm25FromIndex(spark, dir,
      Seq("spark", "shuffle", "filler"), topN = 50, nBuckets = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["),
      "no partition filters reached the postings scan")
    assert(plan.contains("tb#") || plan.contains("tb IN"),
      s"tb pruning filter missing from plan")
  }

  test("length normalization: same tf in a longer doc scores lower " +
    "(b > 0), and b = 0 removes the length effect") {
    val pair = Seq(
      (1L, "target word filler"),
      (2L, "target word filler " + Seq.fill(50)("pad").mkString(" "))
    ).toDF("doc_id", "text")
    val norm = Retrieval.bm25(pair, "doc_id", "text", Seq("target"))
      .as[(Long, Long, Double)].collect().map(x => x._1 -> x._3).toMap
    assert(norm(1L) > norm(2L))
    val flat = Retrieval.bm25(pair, "doc_id", "text", Seq("target"), b = 0.0)
      .as[(Long, Long, Double)].collect().map(x => x._1 -> x._3).toMap
    assert(flat(1L) == flat(2L))
  }
}
