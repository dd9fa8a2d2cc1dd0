package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Large-star/small-star connected components ([[Dedup.connectedComponents]]):
  * parity with min-label propagation on random graphs, O(log n) convergence
  * on a chain where min-label propagation at the same round budget throws,
  * and the usual edge cases.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("star, triangle, pair, chain resolve to component minima") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain → 1
      (10L, 11L), // pair → 10
      (20L, 22L), (21L, 22L), // star via 22 → 20
      (30L, 31L), (31L, 32L), (30L, 32L)) // triangle → 30
      .toDF("id_a", "id_b")
    val got = labelsOf(Dedup.connectedComponents(pairs))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L)
    assert(got == want)
  }

  test("parity with resolveKeepers on seeded random graphs") {
    val rnd = new Random(42)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 40
      val edges = (0 until n).map { _ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.filter(e => e._1 != e._2)
      val pairs = edges.toDF("id_a", "id_b")
      val ls = labelsOf(Dedup.connectedComponents(pairs))
      val mlp = labelsOf(Dedup.resolveKeepers(pairs, maxIter = 50))
      assert(ls == mlp, s"trial $trial: large-star/small-star disagrees " +
        "with min-label propagation")
    }
  }

  test("64-deep chain converges within rounds where min-label cannot") {
    // a chain 0-1-…-64 has diameter 64: min-label propagation needs ~64
    // rounds (throws at maxIter=20); the alternating algorithm is O(log n).
    val chain = (0L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assertThrows[IllegalStateException] {
      Dedup.resolveKeepers(chain, maxIter = 20).count()
    }
    val got = labelsOf(Dedup.connectedComponents(chain, maxIter = 20))
    assert(got.size == 65 && got.values.forall(_ == 0L))
  }

  test("empty input, self-pairs, and duplicate edges") {
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    val messy = Seq((5L, 5L), (6L, 7L), (7L, 6L), (6L, 7L))
      .toDF("id_a", "id_b")
    // self-pair 5 contributes no edge → not in the output (it is in no
    // pair that links it to anything, mirroring resolveKeepers' contract)
    assert(labelsOf(Dedup.connectedComponents(messy)) ==
      Map(6L -> 6L, 7L -> 6L))
  }

  test("bounded path ≡ distributed path on seeded random graphs, " +
      "including empty input and messy edges (r16: the guarded driver " +
      "union-find behind the family probe / contractedComponents / " +
      "cross-modal arbitrations)") {
    val rnd = new Random(163)
    for (trial <- 1 to 5) {
      val n = 40 + trial * 37
      val edges = (0 until n).map { _ =>
        (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
      }.toDF("id_a", "id_b")
      val want = labelsOf(Dedup.connectedComponents(edges))
      val got = labelsOf(Dedup.connectedComponentsBounded(edges))
      assert(got == want, s"trial $trial diverged")
    }
    assert(Dedup.connectedComponentsBounded(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    // self-pair 5 contributes no edge and no node, exactly like the
    // distributed path's canon()
    val messy = Seq((5L, 5L), (6L, 7L), (7L, 6L), (6L, 7L))
      .toDF("id_a", "id_b")
    assert(labelsOf(Dedup.connectedComponentsBounded(messy)) ==
      Map(6L -> 6L, 7L -> 6L))
  }

  test("bounded path FALLS BACK to the distributed algorithm above the " +
      "edge cap, result unchanged") {
    val chain = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val want = labelsOf(Dedup.connectedComponents(chain))
    val got = labelsOf(Dedup.connectedComponentsBounded(chain,
      maxDriverEdges = 10))
    assert(got == want && want.size == 51 && want.values.forall(_ == 0L))
  }

  test("chooser decision is recorded on BOTH paths with edge count, " +
      "effective cap, and call-site tag (r16 verdict #5: a 'bounded by " +
      "construction' edge list that crosses the cap must surface, not " +
      "silently change the plan shape)") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    Dedup.connectedComponentsBounded(edges, tag = "spec-driver")
    val d1 = Dedup.lastCcDecision.get
    assert(d1.path == "driver" && d1.nEdges == 2L &&
      d1.tag == "spec-driver" && d1.cap > 0L)
    val chain = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    Dedup.connectedComponentsBounded(chain, maxDriverEdges = 10,
      tag = "spec-distributed").count()
    val d2 = Dedup.lastCcDecision.get
    // above-cap edge count is the truncated cap+1 observation
    assert(d2.path == "distributed" && d2.nEdges == 11L && d2.cap == 10L &&
      d2.tag == "spec-distributed")
  }

  test("dedupByPairs semantics reproduce under the scale path") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val losers = Dedup.connectedComponents(pairs)
      .filter($"label" =!= $"id").select($"id".as("doc_id"))
    val kept = docs.join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }
}
