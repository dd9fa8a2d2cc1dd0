package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Same calibrated corpus as ProductQuantizerSpec/SimilaritySpec: 20
    * well-separated Gaussian clusters of 25 points in 16-d.
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

  test("index rows carry (cell, m-byte code, exact norm); residual " +
    "reconstruction beats raw-vector PQ at equal bytes") {
    val mdl = IvfPq.train(clustered, nlist = 16, m = 4, ksub = 32)
    val idx = IvfPq.encode(clustered, mdl)
    val lens = idx.select(length(col("code"))).distinct().as[Int].collect().toSeq
    assert(lens == Seq(4))
    assert(idx.select(countDistinct(col("cell"))).as[Long].head() > 1)

    // residual coding concentrates what the codebook must cover: its
    // reconstruction error (vs cent + decoded residual) should be well
    // under raw-vector PQ's at the same (m, ksub) budget
    val rawCb = ProductQuantizer.trainCodebooks(clustered, m = 4, ksub = 32)
    val rows = clustered.as[(Long, Seq[Float], Int)].collect()
    def sq(a: Seq[Double], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val (resErr, rawErr) = rows.map { case (_, e, _) =>
      val cell = IvfAnn.nearestCell(mdl.centroids, e)
      val res = e.indices.map(i => (e(i) - mdl.centroids(cell)(i)).toFloat)
      val dec = ProductQuantizer.decodeVec(mdl.codebooks,
        ProductQuantizer.encodeVec(mdl.codebooks, res))
      val rec = dec.indices.map(i => mdl.centroids(cell)(i) + dec(i))
      val raw = ProductQuantizer.decodeVec(rawCb,
        ProductQuantizer.encodeVec(rawCb, e)).toSeq
      (sq(rec, e), sq(raw, e))
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(resErr < rawErr,
      s"residual coding ($resErr) not better than raw PQ ($rawErr)")
  }

  test("IVF-PQ recall >= 0.9 on the calibrated corpus; recall is " +
    "monotone in nprobe (fixed model)") {
    val q = clustered.filter($"id" % 25 === 0)
    val exact = Similarity.bruteForceTopK(q, clustered, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val mdl = IvfPq.train(clustered, nlist = 16, m = 4, ksub = 32)
    // fixed model → the probed cell set only grows with nprobe
    val recalls = Seq(1, 4, 16).map { np =>
      recallOf(IvfPq.ivfPqTopK(q, clustered, 3, nlist = 16, nprobe = np,
        m = 4, ksub = 32, rerankFactor = 8, model = Some(mdl)), exact)
    }
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    assert(recalls.last >= 0.9, s"recall ${recalls.last} below 0.9")
  }

  test("materialized index: model round-trips exactly, served results " +
    "match in-memory, probes carry a static partition filter") {
    val mdl = IvfPq.train(clustered, nlist = 16, m = 4, ksub = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/idx"
    IvfPq.writeIndex(clustered, mdl, dir)
    val loaded = IvfPq.readModel(spark, dir)
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      mdl.centroids.map(_.toSeq).toSeq)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      mdl.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val q = clustered.filter($"id" % 100 === 0)
    val inMem = IvfPq.ivfPqTopK(q, clustered, 5, nlist = 16, nprobe = 4,
      m = 4, ksub = 16, model = Some(mdl))
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    val served = IvfPq.ivfPqTopKFromIndex(spark, dir, q, clustered, 5,
      nprobe = 4)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(inMem == served)
    val plan = IvfPq.ivfPqTopKFromIndex(spark, dir, q, clustered, 5,
      nprobe = 4).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["),
      "no partition filters reached the codes scan")
    // serving contract: the driver-collect path refuses query sets over
    // the cap instead of accumulating unbounded driver state...
    val big = intercept[IllegalArgumentException] {
      IvfPq.ivfPqTopKFromIndex(spark, dir, clustered, clustered, 5,
        nprobe = 4, maxProbeQueries = 100)
    }
    assert(big.getMessage.contains("maxProbeQueries")
      || big.getMessage.contains("serves at most"))
    // ...and the documented large-|Q| alternative (executor-side cell
    // assignment over a direct codes read) matches the served results
    val direct = IvfPq.ivfPqTopK(q, clustered, 5, nprobe = 4,
      model = Some(loaded),
      codes = Some(spark.read.parquet(s"$dir/codes")))
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(direct == served)
  }

  test("appendToIndex: a batch encoded against the frozen model lands " +
    "inside existing cell partitions; served results equal a fresh index " +
    "over the concatenated corpus with the same model") {
    val base = clustered.filter($"id" < 400)
    val batch = clustered.filter($"id" >= 400)
    val mdl = IvfPq.train(base, nlist = 16, m = 4, ksub = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_app").toString + "/idx"
    IvfPq.writeIndex(base, mdl, dir)
    IvfPq.appendToIndex(batch, spark, dir)
    // codes stayed cell-partitioned: only cell= dirs under codes/
    val cells = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(cells.nonEmpty && cells.forall(_.startsWith("cell=")))
    // appended index ≡ one-shot index over base ∪ batch w/ the same model
    val q = clustered.filter($"id" % 100 === 0)
    val appended = IvfPq.ivfPqTopKFromIndex(spark, dir, q, clustered, 5,
      nprobe = 4).orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    val oneShotDir =
      java.nio.file.Files.createTempDirectory("ivfpq_one").toString + "/idx"
    IvfPq.writeIndex(clustered, mdl, oneShotDir)
    val oneShot = IvfPq.ivfPqTopKFromIndex(spark, oneShotDir, q, clustered,
      5, nprobe = 4).orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(appended == oneShot)
    // batch members are findable through the appended index
    assert(appended.nonEmpty &&
      IvfPq.ivfPqTopKFromIndex(spark, dir,
          clustered.filter($"id" === 410), clustered, 5, nprobe = 4)
        .count() > 0)
  }

  test("deterministic across input partitioning; ranks dense, sims " +
    "sorted, self excluded; pre-encoded codes match on-the-fly") {
    val q = clustered.filter($"id" % 100 === 0)
    val mdl = IvfPq.train(clustered, nlist = 8, m = 4, ksub = 16)
    val a = IvfPq.ivfPqTopK(q, clustered, 5, nlist = 8, nprobe = 4,
      m = 4, ksub = 16, model = Some(mdl))
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    val b = IvfPq.ivfPqTopK(q, clustered.repartition(7), 5, nlist = 8,
      nprobe = 4, m = 4, ksub = 16, model = Some(mdl))
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(a == b)
    assert(a.forall { case (qq, n, _, _) => qq != n })
    a.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1 to 5).toSeq)
      assert(g.sortBy(_._3).map(_._4).sliding(2).forall(p => p(0) >= p(1)))
    }
    val idx = IvfPq.encode(clustered, mdl)
    val c = IvfPq.ivfPqTopK(q, clustered, 5, nlist = 8, nprobe = 4,
      m = 4, ksub = 16, model = Some(mdl), codes = Some(idx))
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(a == c)
  }

  test("driftReport flips the rebuild flag on a planted drifted batch " +
    "and keeps it down on the calibrated region") {
    val rnd = new scala.util.Random(23)
    val dim = 16
    // a dense far-away cluster the frozen model never saw: residuals
    // land outside the trained codebook range, codes collapse, ADC
    // cannot rank inside the region — recall tanks there
    val far = Array.fill(dim)(60.0)
    val drifted = (0 until 200).map(i =>
      (10000L + i,
        far.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq, 99))
      .toDF("id", "embedding", "label")
    val mdl = IvfPq.train(clustered, nlist = 16, m = 4, ksub = 16)
    val dir =
      java.nio.file.Files.createTempDirectory("ivfpq_drift").toString + "/idx"
    IvfPq.writeIndex(clustered, mdl, dir)
    IvfPq.appendToIndex(drifted, spark, dir)
    val full = clustered.unionByName(drifted)
    // held-out probe slice FROM the drifted region
    val driftProbes = drifted.filter($"id" % 40 === 0)
    val r1 = IvfPq.driftReport(spark, dir, driftProbes, full, k = 3,
      nprobe = 4, rerankFactor = 2, recallFloor = 0.9)
      .select("n_queries", "n_expected", "n_hits", "recall", "rebuild")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(r1._1 == 5L && r1._2 == 15L)
    assert(r1._5, s"drifted probe slice must flip rebuild: $r1")
    assert(r1._4 < 0.9, s"recall on the drifted region should tank: $r1")
    // held-out probe slice from the CALIBRATED region: recall holds,
    // flag stays down (the append degraded nothing the model covers)
    val calmProbes = clustered.filter($"id" % 100 === 0)
    val r2 = IvfPq.driftReport(spark, dir, calmProbes, full, k = 3,
      nprobe = 4, rerankFactor = 8, recallFloor = 0.9)
      .select("recall", "rebuild").as[(Double, Boolean)].head()
    assert(!r2._2 && r2._1 >= 0.9,
      s"calibrated region must stay green after the append: $r2")
  }
}
