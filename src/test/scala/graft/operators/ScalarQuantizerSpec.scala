package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScalarQuantizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

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

  test("codes are dim bytes; per-dim round-trip error is bounded by " +
    "half a quantization step") {
    val m = ScalarQuantizer.fit(clustered, "embedding")
    val codes = ScalarQuantizer.encode(clustered, m)
    assert(codes.select(length(col("code"))).distinct().as[Int]
      .collect().toSeq == Seq(16))
    clustered.as[(Long, Seq[Float], Int)].collect().foreach { case (_, e, _) =>
      val d = ScalarQuantizer.decodeVec(m, ScalarQuantizer.encodeVec(m, e))
      e.indices.foreach { i =>
        assert(math.abs(d(i) - e(i)) <= m.scales(i) * 0.5 + 1e-9,
          s"dim $i error ${math.abs(d(i) - e(i))} vs step ${m.scales(i)}")
      }
    }
  }

  test("fit is exactly deterministic across partitioning (min/max has " +
    "no float-associativity wobble)") {
    val a = ScalarQuantizer.fit(clustered, "embedding")
    val b = ScalarQuantizer.fit(clustered.repartition(17), "embedding")
    assert(a.mins.toSeq == b.mins.toSeq && a.scales.toSeq == b.scales.toSeq)
  }

  test("SQ8 recall >= 0.9 on the calibrated corpus, monotone in " +
    "rerankFactor; pre-encoded codes match on-the-fly") {
    val q = clustered.filter($"id" % 25 === 0)
    val exact = Similarity.bruteForceTopK(q, clustered, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val m = ScalarQuantizer.fit(clustered, "embedding")
    def recallAt(rf: Int) = {
      val approx = ScalarQuantizer.sqTopK(q, clustered, 3, rerankFactor = rf,
        model = Some(m))
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    // within-cluster neighbors differ by ~0.1-sigma noise, comparable to
    // the SQ8 step, so quantized sims tie across a cluster — the
    // shortlist must cover the tie group (rf·k >= cluster size) before
    // the exact rerank resolves it, exactly as in ProductQuantizerSpec
    val recalls = Seq(2, 4, 16).map(recallAt)
    assert(recalls == recalls.sorted, s"not monotone: $recalls")
    assert(recalls.last >= 0.9, s"recall ${recalls.last}")

    val idx = ScalarQuantizer.encode(clustered, m)
    val a = ScalarQuantizer.sqTopK(q, clustered, 3, model = Some(m))
      .orderBy("query_id", "rank").collect().toSeq
    val b = ScalarQuantizer.sqTopK(q, clustered, 3, model = Some(m),
      codes = Some(idx)).orderBy("query_id", "rank").collect().toSeq
    assert(a == b)
  }
}
