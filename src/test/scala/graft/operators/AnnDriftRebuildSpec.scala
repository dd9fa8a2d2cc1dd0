package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The drift→rebuild→recovery loop for the served ANN families (r16
  * verdict #1: every family MEASURES staleness — `IvfPq.driftReport`,
  * `ScalarQuantizer.sqDriftReport`, `Similarity.lshDriftReport` — but
  * none rehearsed the RESPONSE those witnesses exist for). Each spec
  * here runs the full production loop the daily-ingest cadence implies
  * (reference shape: `secedgar/core/daily.py:8-60` applied to the
  * vector tier):
  *
  *   1. build the index on the calibrated corpus, APPEND planted drift
  *      against the frozen model/planes,
  *   2. assert the family's driftReport flips `rebuild`,
  *   3. RUN the rebuild (retrain + re-encode + re-serve in place),
  *   4. assert the flag CLEARS, recall ≥ 0.9 on the drifted corpus,
  *      the calibrated region stays green, and the rebuilt index
  *      serves exactly what a FRESH index over the same corpus serves
  *      (training is deterministic, so parity is exact).
  */
class AnnDriftRebuildSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  /** The calibrated corpus (IvfPqSpec's): 20 tight clusters × 25. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian() * 5.0))
    val rows = for (c <- 0 until 20; i <- 0 until 25) yield
      (c.toLong * 25 + i,
        centers(c).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq,
        c)
    rows.toDF("id", "embedding", "label")
  }

  /** Planted drift for the TRAINED families (IVF-PQ, SQ8): a far
    * REGION with the base corpus's own shape — 8 tight sub-clusters
    * × 25 around 60·1. Far enough that the frozen model cannot code it
    * (IVF-PQ residuals escape the codebooks, SQ8 saturates past code
    * 255), yet internally structured so a RETRAINED model ranks inside
    * it at sane shortlist depth: a structureless diffuse Gaussian
    * leaves even a fresh model's ADC near-tied (measured: recall 1.0
    * only at rerankFactor 64 — a 27% corpus scan), and a single tight
    * cluster leaves post-rebuild shortlists as exact ties. New data
    * arriving as new clusters is also what drift looks like.
    */
  private lazy val farCloud = {
    val rnd = new scala.util.Random(29)
    val subCenters = Array.fill(8)(
      Array.fill(dim)(60.0 + rnd.nextGaussian() * 5.0))
    (for (c <- 0 until 8; i <- 0 until 25) yield
      (10000L + c * 25 + i,
        subCenters(c).map(x => (x + rnd.nextGaussian() * 0.1).toFloat)
          .toSeq,
        90 + c))
      .toDF("id", "embedding", "label")
  }

  /** Planted drift for LSH: an ANGULARLY diffuse cloud (σ = 5 around
    * the origin). LSH has no trained model — recall for a region is
    * set by its angular spread against the plane budget — so the drift
    * that matters is a region whose neighbors sit ≥ 2 sign-bits apart
    * under the SERVED configuration: hamming-1 multi-probe under one
    * table stops covering it. (The far cloud would not work here: the
    * 60·1 offset makes it angularly TIGHT, one bucket per table — and
    * a one-sided tight mass signs identically on EVERY ±1 plane, so no
    * re-planing can split it; that failure mode is the occupancy
    * witness's, spec-pinned in SimilaritySpec, and its response is
    * dedup, not rebuild.)
    */
  private lazy val originCloud = {
    val rnd = new scala.util.Random(31)
    (0 until 200).map(i =>
      (20000L + i,
        Seq.tabulate(dim)(_ => (rnd.nextGaussian() * 5.0).toFloat),
        88))
      .toDF("id", "embedding", "label")
  }

  private def tmp(t: String) =
    java.nio.file.Files.createTempDirectory(t).toString + "/idx"

  test("IVF-PQ: appended drift flips driftReport.rebuild; rebuildIndex " +
      "(retrain + re-encode + re-serve) clears the flag, restores " +
      "recall >= 0.9 on the drifted corpus, keeps the calibrated " +
      "region green, and serves exactly what a fresh index serves") {
    val full = clustered.unionByName(farCloud)
    val dir = tmp("ivfpq_loop")
    val mdl = IvfPq.train(clustered, nlist = 16, m = 8, ksub = 32)
    IvfPq.writeIndex(clustered, mdl, dir)
    IvfPq.appendToIndex(farCloud, spark, dir)
    val probes = farCloud.filter($"id" % 40 === 0) // 5 held-out probes
    // rerankFactor 16 covers a whole 25-member sub-cluster (true top-3
    // live there, and within-sub-cluster ADC sims are near-ties the
    // exact rerank must resolve) — while pre-rebuild the codes are
    // COLLAPSED (residuals escape the trained range entirely), so the
    // 48-deep shortlist over the ~200-point probed region stays
    // near-arbitrary and the flip holds
    def report() = IvfPq.driftReport(spark, dir, probes, full, k = 3,
        nprobe = 8, rerankFactor = 16)
      .select("recall", "rebuild").as[(Double, Boolean)].head()
    val before = report()
    assert(before._2 && before._1 < 0.9,
      s"planted drift must flip rebuild: $before")
    // the RESPONSE
    IvfPq.rebuildIndex(full, dir, nlist = 16, m = 8, ksub = 32)
    val after = report()
    assert(!after._2 && after._1 >= 0.9,
      s"rebuild must clear the flag and restore recall: $after")
    val calm = IvfPq.driftReport(spark, dir,
        clustered.filter($"id" % 100 === 0), full, k = 3,
        nprobe = 8, rerankFactor = 8)
      .select("recall", "rebuild").as[(Double, Boolean)].head()
    assert(!calm._2 && calm._1 >= 0.9,
      s"calibrated region must stay green after the rebuild: $calm")
    // served-vs-fresh parity: deterministic training over the same
    // corpus → the rebuilt index IS a fresh index
    val freshDir = tmp("ivfpq_fresh")
    IvfPq.writeIndex(full, IvfPq.train(full, nlist = 16, m = 8,
      ksub = 32), freshDir)
    def served(d: String) = IvfPq.ivfPqTopKFromIndex(spark, d, probes,
        full, 5, nprobe = 8)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(served(dir) == served(freshDir),
      "rebuilt index must serve exactly what a fresh index serves")
    // the production knob: a SAMPLED rebuild (train on half the grown
    // corpus — the 100 TB shape, where a full-corpus k-means per
    // rebuild is the cost that matters) still clears the flag and
    // restores recall; sampling is seeded, so this too is deterministic
    IvfPq.rebuildIndex(full, dir, nlist = 16, m = 8, ksub = 32,
      trainFraction = 0.5)
    val sampled = report()
    assert(!sampled._2 && sampled._1 >= 0.9,
      s"sampled-training rebuild must also recover: $sampled")
  }

  test("SQ8: appended drift flips sqDriftReport.rebuild via the clip " +
      "witness; rebuildIndex re-fits and re-encodes, the census drops " +
      "to zero BY CONSTRUCTION, the flag clears, recall >= 0.9, and " +
      "served results match a fresh index exactly") {
    val full = clustered.unionByName(farCloud)
    val dir = tmp("sq_loop")
    val m0 = ScalarQuantizer.fit(clustered, "embedding")
    ScalarQuantizer.writeIndex(clustered, m0, dir)
    ScalarQuantizer.appendToIndex(farCloud, spark, dir)
    val probes = farCloud.filter($"id" % 40 === 0)
    def report(m: ScalarQuantizer.Model) =
      ScalarQuantizer.sqDriftReport(probes, full, m, k = 3,
          rerankFactor = 16,
          codes = Some(spark.read.parquet(s"$dir/codes")))
        .select("n_clipped", "recall", "rebuild")
        .as[(Long, Double, Boolean)].head()
    val before = report(ScalarQuantizer.readModel(spark, dir))
    assert(before._1 == 200L && before._3,
      s"all 200 appended vectors must clip under the frozen codebook " +
        s"and flip rebuild: $before")
    // the RESPONSE
    val m1 = ScalarQuantizer.rebuildIndex(full, dir)
    val after = report(m1)
    assert(after._1 == 0L,
      s"post-rebuild census must be zero by construction: $after")
    assert(!after._3 && after._2 >= 0.9,
      s"rebuild must clear the flag and restore recall: $after")
    // served-vs-fresh parity (min/max fit is exactly deterministic)
    val freshDir = tmp("sq_fresh")
    ScalarQuantizer.writeIndex(full,
      ScalarQuantizer.fit(full, "embedding"), freshDir)
    def served(d: String) = ScalarQuantizer.sqTopK(probes, full, 5,
        model = Some(ScalarQuantizer.readModel(spark, d)),
        codes = Some(spark.read.parquet(s"$d/codes")))
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(served(dir) == served(freshDir),
      "rebuilt index must serve exactly what a fresh index serves")
  }

  test("LSH: an angularly diffuse appended region tanks recall under a " +
      "single-table layout; re-planing (the OR-construction lever: " +
      "more tables, fewer planes) clears the flag with recall >= 0.9 " +
      "and healthy occupancy, and serves exactly what a fresh layout " +
      "serves") {
    val full = clustered.unionByName(originCloud)
    val dir = tmp("lsh_loop")
    Similarity.writeLshIndex(clustered, dir, nPlanes = 12, nTables = 1)
    val calm0 = Similarity.lshDriftReport(spark, dir,
        clustered.filter($"id" % 25 === 0), clustered, k = 3,
        nPlanes = 12, nTables = 1)
      .select("recall", "max_bucket_share", "rebuild")
      .as[(Double, Double, Boolean)].head()
    assert(!calm0._3 && calm0._1 >= 0.9,
      s"calibrated corpus must be green pre-append: $calm0")
    Similarity.appendToLshIndex(originCloud, dir, nPlanes = 12,
      nTables = 1)
    val probes = originCloud.filter($"id" % 40 === 0)
    val before = Similarity.lshDriftReport(spark, dir, probes, full,
        k = 3, nPlanes = 12, nTables = 1)
      .select("recall", "rebuild").as[(Double, Boolean)].head()
    assert(before._2 && before._1 < 0.9,
      s"diffuse region under one table must flip rebuild via the " +
        s"recall witness: $before")
    // the RESPONSE: re-plane the whole grown corpus
    Similarity.writeLshIndex(full, dir, nPlanes = 6, nTables = 8)
    val after = Similarity.lshDriftReport(spark, dir, probes, full,
        k = 3, nPlanes = 6, nTables = 8)
      .select("recall", "max_bucket_share", "rebuild")
      .as[(Double, Double, Boolean)].head()
    assert(!after._3 && after._1 >= 0.9 && after._2 <= 0.25,
      s"re-planing must clear the flag with healthy occupancy: $after")
    // served-vs-fresh parity (plane signs are seed-deterministic)
    val freshDir = tmp("lsh_fresh")
    Similarity.writeLshIndex(full, freshDir, nPlanes = 6, nTables = 8)
    def served(d: String) = Similarity.lshTopKFromIndex(spark, d,
        probes, 5, nPlanes = 6, nTables = 8)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(served(dir) == served(freshDir),
      "rebuilt layout must serve exactly what a fresh layout serves")
  }
}
