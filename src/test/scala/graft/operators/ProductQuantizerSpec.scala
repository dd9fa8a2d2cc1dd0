package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProductQuantizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Same calibrated corpus shape as SimilaritySpec: 20 well-separated
    * Gaussian clusters of 25 points in 16-d — true neighbors sit in the
    * same cluster, so a working ANN index must reach high recall.
    */
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian() * 5.0))
    val rows = for (c <- 0 until 20; i <- 0 until 25) yield
      (c.toLong * 25 + i,
        centers(c).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq,
        c)
    rows.toDF("id", "embedding", "label")
  }

  private def recallOf(approx: org.apache.spark.sql.DataFrame,
      exact: Set[(Long, Long)]): Double = {
    val a = approx.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    (exact intersect a).size.toDouble / exact.size
  }

  test("codes are m bytes per vector — the 4·dim/m compression is real") {
    val cb = ProductQuantizer.trainCodebooks(clustered, m = 4, ksub = 16)
    val codes = ProductQuantizer.encode(clustered, cb)
    val lens = codes.select(length(col("code"))).distinct()
      .as[Int].collect().toSeq
    assert(lens == Seq(4)) // 16 floats (64 bytes) → 4 bytes
  }

  test("reconstruction error is small next to the signal on clustered " +
    "data (codebooks capture the cluster structure)") {
    val cb = ProductQuantizer.trainCodebooks(clustered, m = 4, ksub = 32,
      iters = 4)
    val stats = clustered.as[(Long, Seq[Float], Int)].collect().map {
      case (_, e, _) =>
        val d = ProductQuantizer.decodeVec(cb, ProductQuantizer.encodeVec(cb, e))
        val err = e.zip(d).map { case (x, y) => (x - y) * (x - y) }.sum
        val sig = e.map(x => x.toDouble * x).sum
        (err, sig)
    }
    val rel = stats.map(_._1).sum / stats.map(_._2).sum
    assert(rel < 0.05, s"relative reconstruction error $rel too high")
  }

  test("PQ recall >= 0.9 on the calibrated clustered corpus, and recall " +
    "is monotone in rerankFactor (fixed codebooks)") {
    val q = clustered.filter($"id" % 25 === 0)
    val exact = Similarity.bruteForceTopK(q, clustered, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val cb = ProductQuantizer.trainCodebooks(clustered, m = 4, ksub = 32,
      iters = 3)
    // tight clusters quantize to IDENTICAL codes, so ADC scores tie
    // across a whole cluster and the shortlist tie-breaks by id — the
    // shortlist must cover the tie group (rerankFactor·k ≥ cluster size)
    // before the exact rerank can find the true neighbors
    val recalls = Seq(2, 4, 8).map { rf =>
      recallOf(ProductQuantizer.pqTopK(q, clustered, 3, m = 4, ksub = 32,
        rerankFactor = rf, codebooks = Some(cb)), exact)
    }
    // fixed codebooks → the reranked shortlist grows with rerankFactor
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    assert(recalls.last >= 0.9, s"recall ${recalls.last} below 0.9")
  }

  test("pqTopK output is deterministic across input partitioning given " +
    "fixed codebooks, ranks dense, sims sorted, self excluded") {
    val q = clustered.filter($"id" % 100 === 0)
    val cb = ProductQuantizer.trainCodebooks(clustered, m = 4, ksub = 16)
    val a = ProductQuantizer.pqTopK(q, clustered, 5, codebooks = Some(cb))
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    val b = ProductQuantizer.pqTopK(q, clustered.repartition(7), 5,
      codebooks = Some(cb))
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(a == b)
    assert(a.forall { case (qq, n, _, _) => qq != n })
    a.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1 to 5).toSeq)
      assert(g.sortBy(_._3).map(_._4).sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("pre-encoded codes path matches on-the-fly encoding (encode once, " +
    "query many)") {
    val q = clustered.filter($"id" % 100 === 0)
    val cb = ProductQuantizer.trainCodebooks(clustered, m = 4, ksub = 16)
    val idx = ProductQuantizer.encode(clustered, cb)
    val a = ProductQuantizer.pqTopK(q, clustered, 3, codebooks = Some(cb))
      .orderBy("query_id", "rank").collect().toSeq
    val b = ProductQuantizer.pqTopK(q, clustered, 3, codebooks = Some(cb),
      codes = Some(idx)).orderBy("query_id", "rank").collect().toSeq
    assert(a == b)
  }
}
