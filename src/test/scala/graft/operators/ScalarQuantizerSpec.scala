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

  test("sqDriftReport flips rebuild on appended out-of-range data " +
    "(clip-rate witness) and stays green on the calibrated corpus " +
    "(r15 verdict #6)") {
    val m = ScalarQuantizer.fit(clustered, "embedding")
    // calibrated: the fitted range covers everything — zero clips,
    // recall holds, flag down
    val calm = ScalarQuantizer.sqDriftReport(
        clustered.filter($"id" % 25 === 0), clustered, m, k = 3,
        rerankFactor = 16)
      .select("n_vecs", "n_clipped", "recall", "rebuild")
      .as[(Long, Long, Double, Boolean)].head()
    assert(calm._1 == 500L && calm._2 == 0L,
      s"calibrated corpus must not clip: $calm")
    assert(calm._3 >= 0.9 && !calm._4,
      s"calibrated region must stay green: $calm")
    // drift: a dense far-away cluster the frozen codebook never saw —
    // every dimension saturates past code 255, the cheap witness fires
    // deterministically whatever recall does
    val rnd = new scala.util.Random(41)
    val far = Array.fill(16)(60.0)
    val drifted = (0 until 200).map(i =>
      (10000L + i,
        far.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq, 99))
      .toDF("id", "embedding", "label")
    val full = clustered.unionByName(drifted)
    val r = ScalarQuantizer.sqDriftReport(
        drifted.filter($"id" % 40 === 0), full, m, k = 3)
      .select("n_vecs", "n_clipped", "clip_rate", "rebuild")
      .as[(Long, Long, Double, Boolean)].head()
    assert(r._1 == 700L && r._2 == 200L,
      s"all 200 appended vectors must register as clipped: $r")
    assert(r._4, s"drifted append must flip rebuild: $r")
  }
}
