package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OPQ — rotated product quantization (Ge et al. 2013, "Optimized
  * Product Quantization"; FAISS's `OPQ{m},PQ{m}` preprocessing): rotate
  * the embedding space so variance decorrelates across the PQ
  * sub-spaces, THEN product-quantize. PQ's error is the sum of
  * per-subspace quantization errors; when dimensions are correlated
  * ACROSS sub-space boundaries, each sub-quantizer wastes its `ksub`
  * budget re-encoding shared structure — a decorrelating rotation makes
  * the sub-spaces carry independent information, so the same byte
  * budget buys less reconstruction error (spec proves it on a
  * correlated fixture).
  *
  * Pure composition of audited pieces: the rotation is
  * [[EmbeddingPca]]'s full-rank eigenbasis (the classical eigen-OPQ
  * initialization) applied WITHOUT mean-centering — an orthonormal
  * rotation preserves every inner product and norm exactly, so cosine
  * ANN in the rotated space returns the same neighbors, while centering
  * would shift the origin and change cosine (spec pins brute-force
  * equality raw-vs-rotated). Quantization is [[ProductQuantizer]]
  * unchanged.
  *
  * Scale shape: identical to PQ — the rotation broadcasts (dim² doubles)
  * and applies map-side; everything downstream is the existing PQ path
  * (ADC scans, bounded-heap top-k, exact rerank on the rotated vectors,
  * which is valid because rotated cosine IS raw cosine).
  *
  * DRIFT under appends (the r15 verdict #6 per-family record): OPQ's
  * trainable state is the rotation + PQ codebooks, and both drift
  * exactly the way IVF-PQ's codebooks do — appended vectors whose
  * residuals fall outside the trained codebook range collapse to
  * extreme codewords and ADC stops ranking the region. OPQ has no
  * standalone served-index layout here (it composes into the PQ/IVF-PQ
  * serving paths), so its staleness gate IS
  * [[IvfPq.driftReport]] run over the serving index it feeds — recall
  * against brute force on a held-out probe slice, spec-pinned both
  * ways in IvfPqSpec. The frozen-model families with their own
  * witnesses are [[Similarity.lshDriftReport]] (occupancy — LSH has no
  * trained model) and [[ScalarQuantizer.sqDriftReport]] (clip rate —
  * the affine range is the model).
  */
object Opq {

  final case class Model(rotation: EmbeddingPca.Model,
      codebooks: ProductQuantizer.Codebooks)

  /** Zero the mean so [[EmbeddingPca.transform]] applies the bare
    * orthonormal rotation `y = R·x` (inner-product preserving).
    */
  private def bareRotation(m: EmbeddingPca.Model): EmbeddingPca.Model =
    m.copy(mean = new Array[Double](m.mean.length))

  /** Eigenvalue allocation (Ge et al. §4, the parametric solution): a
    * plain variance-sorted eigenbasis would CONCENTRATE variance into
    * the first sub-space — the opposite of what PQ wants, since its
    * error is the sum of independent per-sub-space quantization errors
    * and each sub-quantizer has the same `ksub` budget. Assign eigen-
    * directions to sub-spaces greedily balancing the log-product of
    * eigenvalues (∝ the volume each sub-quantizer must cover), so every
    * sub-space gets an equal share of the hard directions. Returns, per
    * sub-space in order, its `dsub` eigen-row indices.
    */
  private[operators] def allocate(eigenvalues: Array[Double], m: Int):
      Array[Array[Int]] = {
    require(eigenvalues.length % m == 0,
      s"dim ${eigenvalues.length} not divisible by m=$m")
    val dsub = eigenvalues.length / m
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val logProd = new Array[Double](m)
    // eigenvalues arrive variance-desc from the PCA fit
    eigenvalues.zipWithIndex.foreach { case (ev, i) =>
      val open = (0 until m).filter(buckets(_).length < dsub)
      val target = open.minBy(logProd)
      buckets(target) += i
      logProd(target) += math.log(math.max(ev, 1e-12))
    }
    buckets.map(_.toArray)
  }

  /** Fit the rotation — the corpus eigenbasis, rows PERMUTED by
    * eigenvalue allocation so variance balances across the `m` PQ
    * sub-spaces — then PQ codebooks on the rotated corpus.
    */
  def train(corpus: DataFrame, embCol: String, m: Int, ksub: Int,
      iters: Int = 3): Model = {
    val dim = corpus.select(size(col(embCol))).head.getInt(0)
    val pca = EmbeddingPca.fit(corpus, embCol, k = dim)
    val perm = allocate(pca.eigenvalues, m).flatten
    val rot = bareRotation(pca.copy(
      components = perm.map(pca.components),
      eigenvalues = perm.map(pca.eigenvalues)))
    val rotated = EmbeddingPca.transform(corpus, embCol, rot)
    // trainCodebooks reads the conventional ("id", "embedding") columns;
    // surface a non-default embCol under that name (dropping any
    // same-named bystander) so the codebooks always train on the ROTATED
    // vectors — previously a custom embCol either crashed or silently
    // trained on an unrotated "embedding" column.
    val conformed =
      if (embCol == "embedding") rotated
      else rotated.drop("embedding").withColumnRenamed(embCol, "embedding")
    Model(rot, ProductQuantizer.trainCodebooks(conformed, m, ksub, iters))
  }

  /** Rotate a frame's embedding column into the model's basis. */
  def rotate(df: DataFrame, embCol: String, model: Model): DataFrame =
    EmbeddingPca.transform(df, embCol, model.rotation)

  /** OPQ top-k: rotate both sides, run the standard PQ ADC scan + exact
    * rerank in the rotated space. Same output contract as
    * [[ProductQuantizer.pqTopK]]; pass `model` to reuse a trained
    * rotation/codebook pair across query batches.
    */
  def opqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 4, ksub: Int = 32, iters: Int = 3, rerankFactor: Int = 4,
      excludeSelf: Boolean = true, model: Option[Model] = None): DataFrame = {
    val mdl = model.getOrElse(train(corpus, "embedding", m, ksub, iters))
    ProductQuantizer.pqTopK(
      rotate(queries, "embedding", mdl),
      rotate(corpus, "embedding", mdl),
      k, m, ksub, iters, rerankFactor, excludeSelf,
      codebooks = Some(mdl.codebooks))
  }

  /** Mean squared reconstruction error of a PQ/OPQ encoding of `corpus`
    * — the quantity the rotation improves at equal bytes. For OPQ the
    * error is measured in the rotated space, which equals the error in
    * the original space (rotations are isometries).
    */
  def reconstructionMse(corpus: DataFrame, embCol: String,
      cb: ProductQuantizer.Codebooks): Double = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    corpus.select(col(embCol)).as[Array[Float]].rdd.map { e =>
      val dec = ProductQuantizer.decodeVec(bc.value,
        ProductQuantizer.encodeVec(bc.value, e))
      var s = 0.0
      var i = 0
      while (i < dec.length) {
        val d = e(i) - dec(i)
        s += d * d
        i += 1
      }
      (s, 1L)
    }.treeReduce { (a, b) => (a._1 + b._1, a._2 + b._2) } match {
      case (s, n) => s / n
    }
  }
}
