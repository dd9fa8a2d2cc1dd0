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

  // ---- bfsLevels ----

  private def srcs(ids: Long*) = ids.toDF("node")

  test("bfs: levels on a diamond with a cycle") {
    // 0 -> 1 -> 3 -> 0 (cycle) ; 0 -> 2 -> 3 ; 3 -> 4
    val e = Seq((0L, 1L), (1L, 3L), (3L, 0L), (0L, 2L), (2L, 3L), (3L, 4L))
      .toDF("s", "d")
    val r = Graph.bfsLevels(e, "s", "d", srcs(0L), maxHops = 10)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfs: maxHops truncates; multi-source takes the min level") {
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val r = Graph.bfsLevels(chain, "s", "d", srcs(0L), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 2L)) // 3, 4 out of budget
    val m = Graph.bfsLevels(chain, "s", "d", srcs(0L, 3L), maxHops = 10)
      .as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
  }

  test("bfs: source absent from edges still reports itself at 0") {
    val e = Seq((0L, 1L)).toDF("s", "d")
    val r = Graph.bfsLevels(e, "s", "d", srcs(7L), maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(7L -> 0L))
  }

  // ---- shortestPaths ----

  test("sssp: weighted detour beats the direct heavy edge") {
    // 0-(10)->2 direct, but 0-(1)->1-(2)->2 is cheaper; 2-(0)->3 free
    val e = Seq((0L, 2L, 10L), (0L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 0L))
      .toDF("s", "d", "w")
    val r = Graph.shortestPaths(e, "s", "d", "w", srcs(0L), rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 3L, 3L -> 3L))
  }

  test("sssp: parallel edges collapse to min weight; rounds bound hops") {
    val e = Seq((0L, 1L, 5L), (0L, 1L, 2L), (1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("s", "d", "w")
    val r1 = Graph.shortestPaths(e, "s", "d", "w", srcs(0L), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(0L -> 0L, 1L -> 2L)) // one relaxation reaches hop 1
    val r3 = Graph.shortestPaths(e, "s", "d", "w", srcs(0L), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(r3 == Map(0L -> 0L, 1L -> 2L, 2L -> 3L, 3L -> 4L))
  }

  test("sssp: extra rounds past convergence are no-ops (cycle-safe)") {
    val e = Seq((0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)).toDF("s", "d", "w")
    val a = Graph.shortestPaths(e, "s", "d", "w", srcs(0L), rounds = 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.shortestPaths(e, "s", "d", "w", srcs(0L), rounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(a == b && a == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("sssp: negative weights are dropped, zero weights kept") {
    val e = Seq((0L, 1L, -4L), (0L, 1L, 0L)).toDF("s", "d", "w")
    val r = Graph.shortestPaths(e, "s", "d", "w", srcs(0L), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 0L, 1L -> 0L))
  }
}
