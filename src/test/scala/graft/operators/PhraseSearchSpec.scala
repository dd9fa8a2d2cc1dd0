package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PhraseSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], phrase: String) =
    Retrieval.phraseSearch(docs.toDF("doc_id", "text"),
      "doc_id", "text", phrase)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("finds consecutive occurrences with counts and first position; " +
    "scattered terms and partial prefixes do not match") {
    val docs = Seq(
      (1L, "x quick brown fox y quick brown fox z"),
      (2L, "quick fox brown quick brown nope"),
      (3L, "brown fox quick"),
      (4L, "quick brown fox"))
    val got = run(docs, "quick brown fox")
    assert(got == Map(1L -> ((2L, 1L)), 4L -> ((1L, 0L))))
  }

  test("overlapping occurrences count separately (repeated-token phrase)") {
    assert(run(Seq((1L, "a a a a")), "a a") == Map(1L -> ((3L, 0L))))
    // repeated term in the phrase must fill BOTH slots
    assert(run(Seq((1L, "a b a x a b")), "a b a") == Map(1L -> ((1L, 0L))))
    assert(run(Seq((1L, "a b x b a")), "a b a").isEmpty)
  }

  test("single-token phrase degenerates to token occurrence counting") {
    val got = run(Seq((1L, "t u t"), (2L, "u u")), "t")
    assert(got == Map(1L -> ((2L, 0L))))
  }

  test("positional index serves row-identical results through a " +
    "partition-pruned positions scan") {
    val docs = (0L until 150L).map(i =>
      (i, (0 until 25).map(j => s"w${(i * 3 + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("positx")
      .toString + "/idx"
    Retrieval.writePositionalIndex(docs, "doc_id", "text", dir, nBuckets = 8)
    val adhoc = Retrieval.phraseSearch(docs, "doc_id", "text", "w2 w3 w4")
      .as[(Long, Long, Long)].collect().toSet
    val served = Retrieval.phraseFromIndex(spark, dir, "w2 w3 w4")
      .as[(Long, Long, Long)].collect().toSet
    assert(adhoc == served && adhoc.nonEmpty)
    val plan = Retrieval.phraseFromIndex(spark, dir, "w2 w3 w4")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["),
      "no partition filters reached the positions scan")
    assert(plan.contains("tb#") || plan.contains("tb IN"),
      "tb pruning filter missing from plan")
  }

  test("results are partitioning-invariant") {
    val docs = (0L until 100L).map(i =>
      (i, (0 until 30).map(j => s"w${(i + j) % 7}").mkString(" ")))
    val a = Retrieval.phraseSearch(docs.toDF("doc_id", "text")
      .repartition(1), "doc_id", "text", "w1 w2 w3")
      .as[(Long, Long, Long)].collect().toSet
    val b = Retrieval.phraseSearch(docs.toDF("doc_id", "text")
      .repartition(13), "doc_id", "text", "w1 w2 w3")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
