package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication") — near-duplicate removal in
  * EMBEDDING space: k-means partitions the corpus into semantic clusters,
  * near-dup search runs only WITHIN each cluster, and every semantic
  * duplicate group keeps one representative. The step LAION/DataComp-style
  * pipelines run after exact and MinHash dedup: paraphrases and
  * re-encodings that share no n-grams still collapse.
  *
  * Pure composition of audited pieces — no new kernels:
  *   - coarse clustering: [[IvfAnn.trainCentroids]] (seeded deterministic
  *     k-means, treeReduce-merged Lloyd steps, sample-trainable);
  *   - within-cluster pairs: [[Similarity.cosineDupPairs]] blocked on the
  *     cell id — exact all-pairs inside bounded cells, LSH sub-blocking
  *     above `maxBlockSize`, exact cosine verification either way;
  *   - group resolution: [[Dedup.connectedComponents]] (large-star/
  *     small-star — a viral meme re-encoded 10k ways forms one giant
  *     component, exactly the skewed topology min-label handles worst).
  *
  * Scale shape for 100 TB: centroids train on a seeded sample and
  * broadcast (nClusters × dim doubles); assignment is map-side; the only
  * shuffle keys are (cell) for pairing — bounded blocks by construction —
  * and the pair graph for resolution. Missing cross-cluster near-dups is
  * the paper's explicit tradeoff (boundary pairs split across cells);
  * raise `nClusters` for tighter clusters, not for coverage.
  */
object SemanticDedup {

  /** Verified near-dup pairs (id_a, id_b, sim) within semantic clusters.
    * `threshold` is cosine similarity; `trainFraction` samples the
    * k-means training set (assignment always covers every row). Pass
    * `centroids` to reuse a trained (or fixture) quantizer — the same
    * seam as [[IvfAnn.ivfTopK]]; `q_semantic_dedup_portable` drives the
    * whole assignment+pairing machinery through it against a DuckDB
    * replay.
    */
  def semDedupPairs(embs: DataFrame, idCol: String, embCol: String,
      nClusters: Int, threshold: Double, iters: Int = 2,
      trainFraction: Double = 1.0, maxBlockSize: Int = 10000,
      centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    require(nClusters > 0, s"nClusters must be positive, got $nClusters")
    val spark = embs.sparkSession
    val corpus = embs.select(col(idCol).as("id"), col(embCol).as("embedding"))
    val cents = centroids.getOrElse(
      IvfAnn.trainCentroids(corpus, nClusters, iters, trainFraction))
    require(cents.nonEmpty, "empty corpus — no centroids to assign against")
    val bc = spark.sparkContext.broadcast(cents)
    val assign = udf((e: Seq[Float]) => IvfAnn.nearestCell(bc.value, e))
    Similarity.cosineDupPairs(
      corpus.withColumn("cell", assign(col("embedding"))),
      "cell", threshold, maxBlockSize)
  }

  /** Materialize the semantic index — the daily-pipeline shape at 100 TB:
    * the corpus is clustered ONCE; each new batch dedups against the
    * index without re-clustering or re-shuffling the corpus.
    *
    * Layout mirrors the LSH / IVF-PQ / BM25 indexes:
    * `path/cells` = (id, embedding, nrm, cell_n) `partitionBy("cell")`,
    * with each cell's size FROZEN at build so the block-size guard is a
    * parquet scan filter; `path/model` = the k-means centroids.
    */
  def writeIndex(embs: DataFrame, idCol: String, embCol: String,
      nClusters: Int, path: String, iters: Int = 2,
      trainFraction: Double = 1.0): Unit = {
    val spark = embs.sparkSession
    import spark.implicits._
    val corpus = embs.select(col(idCol).as("id"), col(embCol).as("embedding"))
    val cents = IvfAnn.trainCentroids(corpus, nClusters, iters, trainFraction)
    require(cents.nonEmpty, "empty corpus — nothing to index")
    val bc = spark.sparkContext.broadcast(cents)
    val assign = udf((e: Seq[Float]) => IvfAnn.nearestCell(bc.value, e))
    corpus.withColumn("cell", assign(col("embedding")))
      .withColumn("nrm", VectorFunctions.l2Norm(col("embedding")))
      .withColumn("cell_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("cell")))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("idx", "vec")
      .repartition(1).write.mode("overwrite").parquet(s"$path/model")
  }

  /** Reload a [[writeIndex]] quantizer. */
  def readCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/model").as[(Int, Seq[Double])]
      .collect().sortBy(_._1).map(_._2.toArray)
  }

  /** Incremental semantic near-dup pairs: the new batch against a
    * materialized [[writeIndex]] corpus, plus batch-internal pairs —
    * every semantic-dup pair involving at least one batch row (batch and
    * corpus ids must be disjoint, as in
    * [[Dedup.incrementalMinhashPairs]]).
    *
    * The batch's cell set (≤ nClusters values) collects driver-side and
    * pushes as a STATIC partition filter on the cells scan — the corpus
    * is never re-clustered, re-shuffled, or scanned outside the probed
    * cells (spec asserts PartitionFilters). Cells whose FROZEN size
    * exceeds `maxCellSize` are excluded from cross pairing and counted
    * loudly ([[Dedup.observeCaps]]), mirroring every other bucketed
    * candidate generator; batch-internal pairs go through
    * [[Similarity.cosineDupPairs]]'s own guarded tiers.
    */
  def incrementalSemPairs(batch: DataFrame, idCol: String, embCol: String,
      indexPath: String, threshold: Double,
      maxCellSize: Int = 10000): DataFrame = {
    val spark = batch.sparkSession
    val cents = readCentroids(spark, indexPath)
    val bc = spark.sparkContext.broadcast(cents)
    val assign = udf((e: Seq[Float]) => IvfAnn.nearestCell(bc.value, e))
    val b = batch.select(col(idCol).as("id"), col(embCol).as("embedding"))
      .withColumn("cell", assign(col("embedding")))
      .withColumn("nrm", VectorFunctions.l2Norm(col("embedding")))
      .localCheckpoint(true)
    val probeCells = b.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val corpus = Dedup.observeCaps(
      spark.read.parquet(s"$indexPath/cells")
        .filter(col("cell").isin(probeCells: _*)),
      "cell_n", maxCellSize, "incrementalSemPairs")
      .filter(col("cell_n") <= maxCellSize)
    val cross = b.select(col("cell"), col("id").as("id_a"),
        col("embedding").as("e_a"), col("nrm").as("nrm_a"))
      .join(corpus.select(col("cell"), col("id").as("id_b"),
        col("embedding").as("e_b"), col("nrm").as("nrm_b")), Seq("cell"))
      .withColumn("sim", VectorFunctions.dot(col("e_a"), col("e_b")) /
        (col("nrm_a") * col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("sim"))
    val internal = Similarity.cosineDupPairs(b, "cell", threshold,
      maxBlockSize = maxCellSize)
      .select(col("id_a"), col("id_b"), col("sim"))
    cross.unionByName(internal)
  }

  /** The dedup decision: every row whose id is NOT its semantic group's
    * minimum is dropped; rows in no group survive untouched. Returns the
    * surviving subset of `embs` with its original schema.
    */
  def semDedup(embs: DataFrame, idCol: String, embCol: String,
      nClusters: Int, threshold: Double, iters: Int = 2,
      trainFraction: Double = 1.0, maxBlockSize: Int = 10000): DataFrame = {
    val pairs = semDedupPairs(embs, idCol, embCol, nClusters, threshold,
      iters, trainFraction, maxBlockSize)
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("label") =!= col("id"))
      .select(col("id").as(idCol))
    embs.join(losers, Seq(idCol), "left_anti")
  }
}
