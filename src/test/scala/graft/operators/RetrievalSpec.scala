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

  test("mmr: redundancy loses to a slightly-less-relevant diverse doc") {
    import org.apache.spark.sql.functions._
    // query q near doc 1; docs 1 and 2 are near-identical; doc 3 is
    // orthogonal-ish but still relevant. Plain top-2 = (1, 2); MMR must
    // pick (1, 3) because 2's redundancy penalty sinks it.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val rows = Seq(
      (100L, v(1.0, 0.0, 0.05)), // the query
      (1L, v(1.0, 0.0, 0.0)),
      (2L, v(0.999, 0.01, 0.0)), // near-dup of 1
      (3L, v(0.5, 0.86, 0.0))) // diverse, moderately relevant
    val df = rows.toDF("id", "embedding")
    val r = Retrieval.mmrDiversify(df.filter(col("id") === 100L),
      df.filter(col("id") < 100L), kCand = 3, kOut = 2)
      .orderBy("mmr_rank")
      .select("neighbor_id", "mmr_rank")
      .as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L), (3L, 2L)))
  }

  test("mmr: rank 1 is pure relevance; ranks are per query; " +
      "deterministic under repartition") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "embedding")
    val qs = df.filter(col("id") < 3)
    val a = Retrieval.mmrDiversify(qs, df, kCand = 10, kOut = 4)
      .orderBy("query_id", "mmr_rank")
      .select("query_id", "neighbor_id", "mmr_rank")
      .as[(Long, Long, Long)].collect().toSeq
    val b = Retrieval.mmrDiversify(qs, df.repartition(9), kCand = 10,
        kOut = 4)
      .orderBy("query_id", "mmr_rank")
      .select("query_id", "neighbor_id", "mmr_rank")
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.groupBy(_._1).forall { case (_, s) =>
      s.map(_._3).sorted == Seq(1L, 2L, 3L, 4L) &&
        s.map(_._2).distinct.size == 4
    })
    // rank 1 equals brute-force rank 1
    val top1 = Similarity.bruteForceTopK(qs, df, 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toMap
    a.filter(_._3 == 1L).foreach { case (q, n, _) =>
      assert(top1(q) == n)
    }
  }
}
