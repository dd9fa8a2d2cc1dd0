package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SemDeDup: planted semantic-duplicate groups collapse to one keeper,
  * dissimilar vectors survive, and the pipeline is deterministic across
  * partitionings (seeded k-means + exact verification).
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  // three well-separated directions; jitter keeps cosine ≈ 0.999
  private def vec(dir: Int, jitter: Float): Array[Float] = {
    val v = new Array[Float](8)
    v(dir) = 1f
    v((dir + 4) % 8) = jitter
    unit(v)
  }

  // dup groups: (0,1,2) on axis 0, (10,11) on axis 1; singles 20, 21, 22
  // (axis 2/3 and a mixed direction dissimilar to everything at 0.9)
  private def embs = Seq(
    (0L, vec(0, 0f)), (1L, vec(0, 0.02f)), (2L, vec(0, 0.04f)),
    (10L, vec(1, 0f)), (11L, vec(1, 0.03f)),
    (20L, vec(2, 0f)), (21L, vec(3, 0f)),
    (22L, unit(Array(1f, 1f, 1f, 1f, 0f, 0f, 0f, 0f)))
  ).toDF("vec_id", "embedding")

  test("planted duplicate groups collapse to their min id; singles survive") {
    val kept = SemanticDedup.semDedup(embs, "vec_id", "embedding",
      nClusters = 3, threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 10L, 20L, 21L, 22L))
  }

  test("semDedupPairs finds exactly the planted near-dup pairs") {
    val pairs = SemanticDedup.semDedupPairs(embs, "vec_id", "embedding",
      nClusters = 3, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L)))
  }

  test("deterministic across input partitionings") {
    def run(parts: Int): Seq[Long] =
      SemanticDedup.semDedup(embs.repartition(parts), "vec_id", "embedding",
        nClusters = 3, threshold = 0.9)
        .select("vec_id").as[Long].collect().sorted.toSeq
    assert(run(1) == run(5))
  }

  test("materialized index + incremental batch: cross and internal pairs " +
    "exact, corpus scan partition-prunes to the batch's cells") {
    val dir = java.nio.file.Files.createTempDirectory("sem-idx")
    dir.toFile.deleteOnExit()
    val path = dir.resolve("idx").toString
    SemanticDedup.writeIndex(embs, "vec_id", "embedding", nClusters = 3,
      path = path)
    // batch: near-dup of corpus 0 (cos≈1), near-dup PAIR inside the batch
    // on axis 1 (also dups of corpus 10), and a novel direction
    val batch = Seq(
      (100L, vec(0, 0.01f)),
      (110L, vec(1, 0.01f)), (111L, vec(1, 0.05f)),
      (120L, unit(Array(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)))
    ).toDF("vec_id", "embedding")
    val pairs = SemanticDedup.incrementalSemPairs(batch, "vec_id",
      "embedding", path, threshold = 0.9)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = Set(
      (0L, 100L), (1L, 100L), (2L, 100L), // batch dup of group A
      (10L, 110L), (11L, 110L), (10L, 111L), (11L, 111L), // of group B
      (110L, 111L)) // batch-internal
    assert(got == want)
    assert(!got.exists(p => p._1 == 120L || p._2 == 120L))
    // static partition pruning reaches the cells scan
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []"),
      "cells scan must carry a non-empty partition filter")
  }

  test("threshold=1+ε removes nothing; tiny corpus with one cluster works") {
    val all = SemanticDedup.semDedup(embs, "vec_id", "embedding",
      nClusters = 1, threshold = 1.01)
      .count()
    assert(all == 8L)
  }
}
