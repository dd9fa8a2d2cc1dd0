package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fact = (0L until 10000L).map(i => (i % 1000L, i))
    .toDF("k", "v")
  private def dim = Seq(7L, 13L, 999L).toDF("dk")

  test("bloomPrunedJoin: row-identical to the plain join") {
    val pruned = BloomPrune.bloomPrunedJoin(fact, dim, "k", "dk")
      .select("k", "v", "dk").as[(Long, Long, Long)].collect().toSet
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "v", "dk").as[(Long, Long, Long)].collect().toSet
    assert(pruned == plain)
    assert(plain.size == 30) // 3 keys × 10 rows each
  }

  test("keyFilter: prunes the probe side to ~selectivity + fpp before " +
    "any shuffle, with zero false negatives") {
    val pred = BloomPrune.keyFilter(dim, "dk", col("k"), fpp = 0.01)
    val kept = fact.filter(pred).count()
    // 30 true rows; fpp 1% of 10000 allows modest false positives but
    // the exchange must carry a small fraction of the fact side
    assert(kept >= 30 && kept < 500, s"kept=$kept")
    // no false negatives: every true-match row survives
    val trueKeys = fact.filter(col("k").isin(7L, 13L, 999L)).count()
    val keptTrue = fact.filter(pred)
      .filter(col("k").isin(7L, 13L, 999L)).count()
    assert(keptTrue == trueKeys)
  }

  test("keyFilter: null probe keys are pruned (inner join drops them " +
    "anyway, so pruning them early is semantics-preserving)") {
    val withNulls = Seq(Some(7L), None, Some(500L)).toDF("k")
    val kept = withNulls
      .filter(BloomPrune.keyFilter(dim, "dk", col("k")))
      .as[Option[Long]].collect().toSet
    assert(kept.contains(Some(7L)) && !kept.contains(None))
  }
}
