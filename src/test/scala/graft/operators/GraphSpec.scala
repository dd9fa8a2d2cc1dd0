package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 1000000000000L

  test("rank mass is conserved up to integer truncation") {
    // 4-node cycle: perfectly symmetric, every node keeps exactly S/4
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("s", "d")
    val r = Graph.pageRank(cycle, "s", "d", iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(r.size == 4)
    assert(r.values.toSet == Set(S / 4))
  }

  test("a sink-heavy chain ranks downstream nodes higher") {
    // 0 -> 1 -> 2: rank accumulates downstream; 2 is dangling
    val chain = Seq((0L, 1L), (1L, 2L)).toDF("s", "d")
    val r = Graph.pageRank(chain, "s", "d", iterations = 8)
      .as[(Long, Long)].collect().toMap
    assert(r(2L) > r(1L) && r(1L) > r(0L))
    // dangling redistribution keeps the root above the no-inlink floor
    // of a graph WITHOUT redistribution: root still gets dang/n share
    val floor = 15L * (S / 3) / 100
    assert(r(0L) > floor)
  }

  test("hub: all mass funnels into the single authority") {
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)).toDF("s", "d")
    val r = Graph.pageRank(star, "s", "d", iterations = 8)
      .as[(Long, Long)].collect().toMap
    assert(r(0L) > r(1L) * 2)
    assert(Seq(1L, 2L, 3L, 4L).map(r).distinct.size == 1) // symmetric spokes
  }

  test("parallel edges collapse and result is partitioning-invariant") {
    val dup = Seq((0L, 1L), (0L, 1L), (0L, 1L), (1L, 0L)).toDF("s", "d")
    val a = Graph.pageRank(dup, "s", "d", iterations = 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(
      Seq((0L, 1L), (1L, 0L)).toDF("s", "d").repartition(7),
      "s", "d", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("null endpoints drop instead of becoming a null node") {
    val e = Seq((Some(0L), Some(1L)), (None, Some(2L)), (Some(1L), None))
      .toDF("s", "d")
    val r = Graph.pageRank(e, "s", "d", iterations = 2)
    assert(r.filter(col("node").isNull).count() == 0)
    assert(r.count() == 2) // only 0 and 1 survive
  }

  test("empty edge set is refused") {
    val e = Seq.empty[(Long, Long)].toDF("s", "d")
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "s", "d", iterations = 1)
    }
  }
}
