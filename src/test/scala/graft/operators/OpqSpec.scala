package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** OPQ: the rotation is an isometry (exact ANN unchanged), it strictly
  * improves PQ reconstruction on cross-subspace-correlated data (the
  * whole point of OPQ), and the composed index reaches the same recall
  * bar as the other ANN families.
  */
class OpqSpec extends AnyFunSuite {
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

  /** dim-8 vectors whose second half mirrors the first (strong
    * cross-boundary correlation for m=2 sub-spaces split 0-3 / 4-7):
    * plain PQ spends both sub-quantizers encoding the SAME structure.
    */
  private lazy val correlated = {
    val rnd = new scala.util.Random(11)
    (0 until 400).map { i =>
      val a = Array.fill(4)(rnd.nextGaussian().toFloat)
      (i.toLong, (a ++ a.map(x => x + rnd.nextGaussian().toFloat * 0.05f)).toSeq)
    }.toDF("id", "embedding")
  }

  test("the bare rotation is an isometry: exact cosine top-k identical " +
    "raw vs rotated") {
    val mdl = Opq.train(clustered, "embedding", m = 4, ksub = 16)
    val q = clustered.filter($"id" % 25 === 0)
    val raw = Similarity.bruteForceTopK(q, clustered, 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val rot = Similarity.bruteForceTopK(
      Opq.rotate(q, "embedding", mdl),
      Opq.rotate(clustered, "embedding", mdl), 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(raw == rot)
  }

  test("train honors a non-default embedding column, even beside a " +
    "decoy column named 'embedding'") {
    val base = Opq.train(correlated, "embedding", m = 2, ksub = 8, iters = 2)
    val decoyed = correlated.withColumnRenamed("embedding", "emb")
      .withColumn("embedding",
        array((0 until 8).map(_ => lit(0.0f)): _*))
    val viaEmb = Opq.train(decoyed, "emb", m = 2, ksub = 8, iters = 2)
    // identical codebooks ⇔ it trained on the rotated custom column, not
    // the zero-vector decoy (training is bitwise-deterministic)
    assert(base.codebooks.flatten.flatten.toSeq ==
      viaEmb.codebooks.flatten.flatten.toSeq)
  }

  test("rotation reduces PQ reconstruction error on cross-subspace-" +
    "correlated data at equal bytes") {
    val m = 2; val ksub = 16
    val cbRaw = ProductQuantizer.trainCodebooks(correlated, m, ksub,
      iters = 4)
    val mseRaw = Opq.reconstructionMse(correlated, "embedding", cbRaw)
    val mdl = Opq.train(correlated, "embedding", m, ksub, iters = 4)
    val mseRot = Opq.reconstructionMse(
      Opq.rotate(correlated, "embedding", mdl), "embedding", mdl.codebooks)
    assert(mseRot < mseRaw * 0.5,
      s"rotation should at least halve the MSE here: raw $mseRaw vs " +
        s"rotated $mseRot")
  }

  test("OPQ recall >= 0.9 on the calibrated clustered corpus") {
    val q = clustered.filter($"id" % 25 === 0)
    val exact = Similarity.bruteForceTopK(q, clustered, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // rerankFactor 8: tight clusters quantize to IDENTICAL codes (same
    // caveat as ProductQuantizerSpec) and the balanced rotation makes
    // in-cluster codes collide more, so the shortlist must cover the
    // larger ADC tie groups
    val approx = Opq.opqTopK(q, clustered, 3, m = 4, ksub = 32,
      rerankFactor = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall too low")
  }
}
