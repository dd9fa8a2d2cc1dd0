package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * k-means training set (assignment always covers every row).
    */
  def semDedupPairs(embs: DataFrame, idCol: String, embCol: String,
      nClusters: Int, threshold: Double, iters: Int = 2,
      trainFraction: Double = 1.0, maxBlockSize: Int = 10000): DataFrame = {
    require(nClusters > 0, s"nClusters must be positive, got $nClusters")
    val spark = embs.sparkSession
    val corpus = embs.select(col(idCol).as("id"), col(embCol).as("embedding"))
    val cents = IvfAnn.trainCentroids(corpus, nClusters, iters, trainFraction)
    require(cents.nonEmpty, "empty corpus — no centroids to assign against")
    val bc = spark.sparkContext.broadcast(cents)
    val assign = udf((e: Seq[Float]) => IvfAnn.nearestCell(bc.value, e))
    Similarity.cosineDupPairs(
      corpus.withColumn("cell", assign(col("embedding"))),
      "cell", threshold, maxBlockSize)
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
