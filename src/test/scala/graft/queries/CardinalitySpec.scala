package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q_ngram_stats counts distinct trigrams EXACTLY (two-level agg — the
  * oracle-checkable form). At 100 TB the distinct-shingle count per
  * source is billions of keys; the scale path is `approx_count_distinct`
  * (HyperLogLog++, constant memory, mergeable partials). This spec pins
  * the swap's error contract on the real testdata.
  */
class CardinalitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct stays within its rsd bound of the exact " +
    "distinct-trigram counts per source") {
    val sh = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("source"),
        explode(graft.functions.TextFunctions.wordShingles(col("text"), 3))
          .as("s"))
    val exact = sh.groupBy("source", "s").agg(count(lit(1)))
      .groupBy("source").agg(count(lit(1)).as("exact"))
    val approx = sh.groupBy("source")
      .agg(approx_count_distinct(col("s"), 0.02).as("approx"))
    val rows = exact.join(approx, Seq("source"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, e, a) =>
      val rel = math.abs(a - e).toDouble / e
      // rsd 0.02 is a standard deviation, not a hard bound — allow 5σ
      assert(rel < 0.10, s"$src: approx $a vs exact $e (rel $rel)")
    }
  }

  test("approx_count_distinct is deterministic across partitioning " +
    "(HLL merge is order-insensitive)") {
    val d = (1 to 50000).map(i => s"v${i % 9173}").toDF("v")
    val a = d.repartition(3).agg(approx_count_distinct(col("v"), 0.02))
      .as[Long].head()
    val b = d.repartition(23).agg(approx_count_distinct(col("v"), 0.02))
      .as[Long].head()
    assert(a == b, s"HLL estimate moved with partitioning: $a vs $b")
  }
}
