package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** kCore peeling on a hand-computed graph: a 4-clique {1,2,3,4} with a
  * pendant chain 4-5-6 and a triangle {7,8,9} hanging off node 1 via 7.
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // 4-clique
    (4L, 5L), (5L, 6L),                                         // chain
    (1L, 7L), (7L, 8L), (7L, 9L), (8L, 9L)                      // triangle
  ).toDF("src", "dst")

  test("2-core strips the pendant chain, keeps clique + triangle") {
    val out = Graph.kCore(edges, "src", "dst", k = 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    // chain nodes 5,6 peel (degree cascade); 1-7 bridge survives? node 7
    // has degree 3 (1,8,9), node 1 has degree 4 — all of {1,2,3,4,7,8,9}
    // keep degree >= 2 after dropping 5 and 6.
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L))
  }

  test("3-core keeps only the 4-clique") {
    val out = Graph.kCore(edges, "src", "dst", k = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("4-core is empty; duplicate and reversed edges collapse") {
    assert(Graph.kCore(edges, "src", "dst", k = 4).count() == 0)
    val withDups = edges.unionAll(edges.select(col("dst").as("src"),
      col("src").as("dst")))
    val out = Graph.kCore(withDups, "src", "dst", k = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }
}
