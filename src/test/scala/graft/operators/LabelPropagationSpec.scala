package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], rounds: Int) =
    Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", rounds)
      .as[(Long, Long)].collect().toSet

  test("two triangles over a bridge converge to two communities") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    // hand-propagated: after 4 synchronous rounds the left triangle
    // agrees on 1 and the right on 3 (the bridge endpoint's label)
    assert(lpa(edges, rounds = 4) == Set(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 3L), (11L, 3L), (12L, 3L)))
  }

  test("one round: most-frequent neighbor label, ties to the minimum") {
    // star center 5 sees {1, 2} — tie, min label 1 wins; leaves adopt 5
    assert(lpa(Seq((5L, 1L), (5L, 2L)), rounds = 1) ==
      Set((5L, 1L), (1L, 5L), (2L, 5L)))
  }

  test("parallel edges collapse to one vote") {
    // if (2,3) voted three times, node 2 would adopt 3; with the simple
    // graph it is a {1, 3} tie and the minimum 1 wins
    val edges = Seq((1L, 2L), (1L, 3L),
      (2L, 3L), (2L, 3L), (3L, 2L))
    val got = lpa(edges, rounds = 1)
    assert(got((2L, 1L)), s"node 2 should adopt label 1, got $got")
  }

  test("self-loops are dropped and never vote") {
    assert(lpa(Seq((7L, 7L), (7L, 8L)), rounds = 1) ==
      Set((7L, 8L), (8L, 7L)))
  }

  test("modularity of the two-triangle partition, exact integers") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 3L), (11L, 3L), (12L, 3L)).toDF("node", "label")
    val got = Graph.modularity(edges.toDF("src", "dst"), "src", "dst", labels)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    // m = 7; each triangle: e_in = 3, d_sum = 7 (2+2+3 with the bridge
    // endpoint), q_num = 4·7·3 − 49 = 35, contrib = 35/196
    assert(got == Set(
      (1L, 3L, 3L, 7L, 35L, 35.0 / 196.0),
      (3L, 3L, 3L, 7L, 35L, 35.0 / 196.0)))
  }

  test("one community holding every node scores exactly zero") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val labels = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("node", "label")
    val got = Graph.modularity(edges.toDF("src", "dst"), "src", "dst", labels)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set((9L, 3L, 3L, 6L, 0L, 0.0)))
  }

  test("modularity dedups parallel edges and drops self-loops") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (3L, 4L))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L))
      .toDF("node", "label")
    val got = Graph.modularity(edges.toDF("src", "dst"), "src", "dst", labels)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    // m = 2 simple edges; community 1 = {1,2}: e_in 1, d_sum 2,
    // q_num = 4·2·1 − 4 = 4, contrib 4/16; singletons: e_in 0,
    // d_sum 1, q_num = −1, contrib −1/16
    assert(got == Set(
      (1L, 2L, 1L, 2L, 4L, 4.0 / 16.0),
      (3L, 1L, 0L, 1L, -1L, -1.0 / 16.0),
      (4L, 1L, 0L, 1L, -1L, -1.0 / 16.0)))
  }

  test("round bounds are enforced") {
    intercept[IllegalArgumentException] {
      lpa(Seq((1L, 2L)), rounds = 0)
    }
    intercept[IllegalArgumentException] {
      lpa(Seq((1L, 2L)), rounds = 21)
    }
  }
}
