package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splitAssign: labels are stable under row order and partitioning, " +
    "and proportions track the weights") {
    val docs = (0L until 2000L).toDF("doc_id")
    val a = CorpusOps.splitAssign(docs, "doc_id",
      Seq(("train", 90), ("val", 5), ("test", 5)))
      .as[(Long, String)].collect().toMap
    val b = CorpusOps.splitAssign(docs.orderBy(rand(1)).repartition(7),
      "doc_id", Seq(("train", 90), ("val", 5), ("test", 5)))
      .as[(Long, String)].collect().toMap
    assert(a == b) // content-hash split: order/partitioning irrelevant
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0)
    assert(math.abs(frac("train") - 0.90) < 0.03)
    assert(math.abs(frac("val") - 0.05) < 0.02)
    assert(math.abs(frac("test") - 0.05) < 0.02)
  }

  test("packShards: two-phase range-partitioned form equals the naive " +
    "global-window cumsum, and shard token totals respect the budget") {
    val docs = (0L until 500L).map(i => (i, 1L + (i * 37) % 400))
      .toDF("doc_id", "n_tokens")
    val budget = 3000L
    val fast = CorpusOps.packShards(docs.repartition(9), "doc_id",
      "n_tokens", budget)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    val naive = docs.withColumn("before", coalesce(sum("n_tokens").over(
        Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard_id", expr(s"before DIV ${budget}L"))
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(fast == naive)
    // every shard's token total stays within budget + one max-doc slack
    // (greedy packing can overshoot by at most the doc that crosses the
    // boundary)
    val totals = docs.as[(Long, Long)].collect().toMap
    val byShard = fast.groupBy(_._2).view
      .mapValues(_.keys.map(totals).sum).toMap
    byShard.foreach { case (shard, tot) =>
      assert(tot <= budget + 400, s"shard $shard holds $tot tokens")
    }
    assert(byShard.size > 1)
  }

  test("vocabulary: tf counts every occurrence, df counts documents, " +
    "top-n is a total order") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "banana! banana? cherry.")).toDF("doc_id", "text")
    val got = CorpusOps.vocabulary(docs, "doc_id", "text", 2)
      .as[(String, Long, Long)].collect().toSeq
    // banana tf=3 df=2; apple tf=3 df=2 — tie broken by token asc
    assert(got == Seq(("apple", 3L, 2L), ("banana", 3L, 2L)))
  }
}
