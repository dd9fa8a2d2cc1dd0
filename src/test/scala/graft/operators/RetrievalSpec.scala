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
      Seq("spark", "shuffle", "filler"), topN = 50)
      .as[(Long, Long, Double)].collect().toSeq
    assert(adhoc == served) // bitwise, including the double scores
    // the postings scan must carry a static partition filter on tb
    val plan = Retrieval.bm25FromIndex(spark, dir,
      Seq("spark", "shuffle", "filler"), topN = 50)
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

  test("bm25Batch: one-pass batch scoring is bitwise-identical to the " +
    "single-query path, per query") {
    import org.apache.spark.sql.functions._
    val queries = Seq(
      (100L, Seq("spark", "shuffle", "partition")),
      (101L, Seq("partition")),
      (102L, Seq("nonexistentterm"))
    ).toDF("query_id", "terms")
    val batch = Retrieval.bm25Batch(docs, "doc_id", "text",
        queries, "query_id", "terms")
      .select("query_id", "doc_id", "rank", "n_terms", "score")
      .as[(Long, Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._4, r._5)).toSet).toMap
    val single = Map(
      100L -> Seq("spark", "shuffle", "partition"),
      101L -> Seq("partition"))
      .view.mapValues(ts => Retrieval.bm25(docs, "doc_id", "text", ts)
        .as[(Long, Long, Double)].collect().toSet).toMap
    assert(batch(100L) == single(100L))
    assert(batch(101L) == single(101L))
    assert(!batch.contains(102L)) // no matching postings → no rows
  }

  test("bm25BatchFromIndex: identical to the ad-hoc batch path, postings " +
    "scan carries a static partition filter, oversized term sets refused") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("bm25b").toString + "/idx"
    Retrieval.writeBm25Index(docs, "doc_id", "text", dir)
    val queries = Seq(
      (100L, Seq("spark", "shuffle", "partition")),
      (101L, Seq("partition", "cooking"))
    ).toDF("query_id", "terms")
    val adhoc = Retrieval.bm25Batch(docs, "doc_id", "text",
        queries, "query_id", "terms")
      .as[(Long, Long, Int, Long, Double)].collect().toSet
    val served = Retrieval.bm25BatchFromIndex(spark, dir,
      queries, "query_id", "terms")
    assert(served.as[(Long, Long, Int, Long, Double)].collect().toSet
      == adhoc)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["),
      "no partition filter reached the postings scan")
    val big = intercept[IllegalArgumentException] {
      Retrieval.bm25BatchFromIndex(spark, dir, queries, "query_id",
        "terms", maxQueryTerms = 2)
    }
    assert(big.getMessage.contains("serves at most"))
  }

  test("rrfFuse: exact reciprocal-rank arithmetic, both-arm docs beat " +
    "single-arm docs with comparable ranks, topN bounds each query") {
    import org.apache.spark.sql.functions._
    val sparse = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 11L, 1), (1L, 13L, 2))
      .toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(sparse, dense), kRrf = 60, topN = 3)
      .select("doc_id", "rrf", "n_arms", "fused_rank")
      .as[(Long, Double, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(fused(11L)._2 == 1.0 / 62 + 1.0 / 61 && fused(11L)._3 == 2L)
    assert(fused(11L)._4 == 1) // both arms → top fused rank
    assert(fused(10L)._2 == 1.0 / 61 && fused(10L)._3 == 1L)
    assert(fused.size == 3 && !fused.contains(12L)) // 1/63 loses to 1/62
    assert(fused.values.map(_._4).toSet == Set(1, 2, 3))
  }
}
