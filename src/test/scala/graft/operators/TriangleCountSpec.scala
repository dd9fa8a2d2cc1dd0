package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TriangleCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val r = Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private def brute(edges: Seq[(Long, Long)]): Long = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    nodes.combinations(3).count { case Seq(a, b, c) =>
      und((a, b)) && und((a, c)) && und((b, c))
    }
  }

  test("triangle, square, star, K4") {
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 1L)))._4 == 1L)
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))._4 == 0L)
    assert(count((2L to 9L).map(i => (1L, i)))._4 == 0L) // star
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val (n, e, w, t) = count(k4)
    assert((n, e, t) == (4L, 6L, 4L))
    assert(w >= t) // every triangle closes a wedge
  }

  test("parallel edges, reversed duplicates, and self-loops collapse") {
    val (n, e, _, t) = count(Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L),
      (2L, 3L), (3L, 1L)))
    assert((n, e, t) == (3L, 3L, 1L))
  }

  test("matches brute force on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong))
    assert(count(edges)._4 == brute(edges))
  }

  test("matches brute force on a skewed hub graph") {
    // hub 0 connects to everyone; ring among the rest — degree
    // orientation must still count each triangle once
    val edges = (1L to 30L).map(i => (0L, i)) ++
      (1L until 30L).map(i => (i, i + 1)) :+ (30L, 1L)
    assert(count(edges)._4 == brute(edges))
  }
}
