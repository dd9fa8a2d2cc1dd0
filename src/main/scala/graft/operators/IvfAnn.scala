package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate-nearest-neighbor — the second scale
  * path for embedding search beside [[Similarity.lshTopK]]:
  *
  *   1. a coarse quantizer partitions the corpus into `nlist` cells
  *      (k-means trained with deterministic seeding and a few Lloyd
  *      iterations, each one DataFrame aggregation);
  *   2. the corpus is assigned map-side against broadcast centroids
  *      (`nlist × dim` doubles — KBs, never a shuffle);
  *   3. each query probes its `nprobe` nearest cells and exact-reranks
  *      inside them via the bounded-heap top-k merge.
  *
  * At 100 TB the assigned index is written once, partitioned by `cell`,
  * so a probe scans `nprobe / nlist` of the corpus (partition pruning on
  * the cell key); training runs on a sample. Recall lever: `nprobe` up.
  *
  * The argmin kernels are Scala UDFs on purpose: an argmin over `nlist`
  * literal arrays as a Column expression defeats codegen limits, and the
  * tight primitive loop here is the "genuine per-partition imperative
  * logic" case — everything around it stays relational.
  */
object IvfAnn {

  private def sqDist(c: Array[Double], e: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) {
      val d = c(i) - e(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Index of the nearest centroid. */
  def nearestCell(cents: Array[Array[Double]], e: Seq[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val d = sqDist(cents(i), e)
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Indexes of the `nprobe` nearest centroids (ascending distance). */
  def nearestCells(cents: Array[Array[Double]], e: Seq[Float],
      nprobe: Int): Array[Int] =
    cents.indices.map(i => (sqDist(cents(i), e), i)).sorted
      .take(nprobe).map(_._2).toArray

  private def nearestCellArr(cents: Array[Array[Double]], e: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var s = 0.0
      var j = 0
      while (j < c.length) { val d = c(j) - e(j); s += d * d; j += 1 }
      if (s < bestD) { bestD = s; best = i }
      i += 1
    }
    best
  }

  /** Deterministic k-means: seeds are the `nlist` corpus vectors ranked by
    * `xxhash64(id)` (reproducible pseudo-random, no RNG state), then
    * `iters` Lloyd steps. Each step is one `mapPartitions` kernel over
    * primitive arrays — per-partition (cell × dim) running sums — merged
    * with `treeReduce`, so the driver only ever sees ONE (nlist × dim)
    * matrix regardless of partition count (the old driver-side loop was
    * O(partitions × nlist × dim) doubles through `collect()`). The tree
    * merge's fp-addition order can vary across runs by an ulp; seeds and
    * assignments are exact, and a sub-ulp centroid wobble only moves a
    * vector between cells on an exact distance tie (measure-zero), so
    * query output is stable. Empty cells keep their old centroid.
    */
  def trainCentroids(corpus: DataFrame, nlist: Int,
      iters: Int = 2, trainFraction: Double = 1.0): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // at 100 TB the quantizer trains on a sample (seeded → deterministic);
    // assignment still covers the full corpus
    val base =
      if (trainFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, trainFraction, seed = 42L)
    var cents = base
      .select(col("id"), col("embedding"))
      .orderBy(xxhash64(col("id").cast("string")), col("id"))
      .limit(nlist)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    if (cents.isEmpty) return cents
    // training iterates over these vectors `iters` times — persist so each
    // Lloyd step replays blocks instead of re-scanning the source, and
    // release the blocks explicitly once training converges
    val vecs = base.select(col("embedding")).as[Array[Float]].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 0 until iters) {
        val bc = spark.sparkContext.broadcast(cents)
        val (sums, counts) = vecs.mapPartitions { it =>
          if (!it.hasNext) Iterator.empty
          else {
            val c = bc.value
            val s = Array.ofDim[Double](c.length, c(0).length)
            val n = new Array[Long](c.length)
            it.foreach { e =>
              val cell = nearestCellArr(c, e)
              n(cell) += 1
              var j = 0
              while (j < e.length) { s(cell)(j) += e(j); j += 1 }
            }
            Iterator.single((s, n))
          }
        }.treeReduce { (a, b) =>
          // executor-side pairwise merge; mutating the left side is safe
          // (each partition's element is consumed exactly once)
          var i = 0
          while (i < a._1.length) {
            val sa = a._1(i)
            val sb = b._1(i)
            var j = 0
            while (j < sa.length) { sa(j) += sb(j); j += 1 }
            a._2(i) += b._2(i)
            i += 1
          }
          a
        }
        val next = cents.map(_.clone())
        for (cell <- 0 until nlist if counts(cell) > 0) {
          var j = 0
          while (j < next(cell).length) {
            next(cell)(j) = sums(cell)(j) / counts(cell)
            j += 1
          }
        }
        bc.unpersist()
        cents = next
      }
      cents
    } finally vecs.unpersist(blocking = false)
  }

  /** IVF top-k: probe `nprobe` cells per query, exact cosine rerank,
    * bounded-heap merge. Same output shape as [[Similarity.bruteForceTopK]].
    * Pass `centroids` to reuse a trained quantizer across query batches
    * (train once, probe many — the production shape); given fixed
    * centroids, the probed cell set only GROWS with `nprobe`, so recall
    * is provably monotone in it.
    */
  /** `metaCols` are corpus columns carried onto each candidate so
    * `candidateFilter` can reference them — FILTERED vector search
    * (the "lang = 'en' AND license ok" retrieval constraint), applied
    * as a post-filter over the probed posting lists: the standard
    * strategy when the predicate is not selective enough to warrant
    * per-predicate indexes. Callers compensate recall by raising
    * `nprobe`/`k` (a highly-selective filter empties cells — the same
    * trade FAISS/Vespa document for post-filtering).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2,
      trainFraction: Double = 1.0, excludeSelf: Boolean = true,
      centroids: Option[Array[Array[Double]]] = None,
      metaCols: Seq[String] = Nil,
      candidateFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(
      centroids.getOrElse(trainCentroids(corpus, nlist, iters, trainFraction)))
    val assign = udf((e: Seq[Float]) => nearestCell(bc.value, e))
    val probes = udf((e: Seq[Float]) => nearestCells(bc.value, e, nprobe))
    val c = corpus.select(col("id").as("neighbor_id") +:
      col("embedding").as("c_emb") +:
      VectorFunctions.l2Norm(col("embedding")).as("c_nrm") +:
      assign(col("embedding")).as("cell") +:
      metaCols.map(col): _*)
    val q = broadcast(queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"),
      VectorFunctions.l2Norm(col("embedding")).as("q_nrm"),
      explode(probes(col("embedding"))).as("cell")))
    val cand0 = c.join(q, Seq("cell"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    val cand = candidateFilter.fold(cand0)(cand0.filter)
      .withColumn("sim", VectorFunctions.dot(col("q_emb"), col("c_emb")) /
        (col("q_nrm") * col("c_nrm")))
    Similarity.topKMerge(cand, k)
  }
}
