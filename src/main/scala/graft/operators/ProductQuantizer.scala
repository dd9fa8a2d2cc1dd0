package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compressed-index ANN path beside
  * [[Similarity.lshTopK]] (hash buckets) and [[IvfAnn.ivfTopK]] (coarse
  * cells):
  *
  *   1. split each `dim`-vector into `m` subvectors; k-means each
  *      subspace independently (`ksub` centroids, one shared Lloyd pass —
  *      all `m` quantizers train in a single `mapPartitions` kernel per
  *      iteration, merged with `treeReduce` like [[IvfAnn.trainCentroids]]);
  *   2. encode every corpus vector as `m` one-byte centroid ids — a
  *      `dim × 4`-byte float array becomes `m` bytes (e.g. 64× at
  *      dim=128, m=8): at 100 TB THIS is the index that fits in memory;
  *   3. queries score codes by asymmetric distance: one `m × ksub` table
  *      of subspace dot products per query, then each pair costs O(m)
  *      lookups instead of O(dim) multiplies — streamed through the same
  *      bounded-heap top-k merge as the exact path (map-side partial
  *      aggregation; the candidate set never shuffles);
  *   4. the approximate top `k × rerankFactor` join back to the raw
  *      embeddings for an exact cosine rerank (fixed codebooks → the
  *      candidate set grows with `rerankFactor`, so recall is monotone
  *      in it).
  */
object ProductQuantizer {

  /** codebooks(subspace)(centroid)(coordinate); ksub <= 256 so codes fit
    * one byte per subspace.
    */
  type Codebooks = Array[Array[Array[Double]]]

  /** Train the `m` subspace quantizers. Seeds are the first `ksub`
    * corpus vectors ranked by `xxhash64(id)` (deterministic, no RNG),
    * sliced per subspace; then `iters` Lloyd steps run for ALL subspaces
    * in one kernel per iteration. At 100 TB train on a sample
    * (`trainFraction`) — encoding still covers the full corpus.
    */
  def trainCodebooks(corpus: DataFrame, m: Int, ksub: Int,
      iters: Int = 3, trainFraction: Double = 1.0): Codebooks = {
    require(ksub >= 1 && ksub <= 256, "ksub must be 1..256 (one byte)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val base =
      if (trainFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, trainFraction, seed = 42L)
    val seeds = base
      .select(col("id"), col("embedding"))
      .orderBy(xxhash64(col("id").cast("string")), col("id"))
      .limit(ksub)
      .select(col("embedding")).as[Array[Float]].collect()
    require(seeds.nonEmpty, "empty training corpus")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    var cb: Codebooks = Array.tabulate(m, seeds.length, dsub) {
      (s, c, j) => seeds(c)(s * dsub + j).toDouble
    }
    val vecs = base.select(col("embedding")).as[Array[Float]].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 0 until iters) {
        val bc = spark.sparkContext.broadcast(cb)
        val (sums, counts) = vecs.mapPartitions { it =>
          if (!it.hasNext) Iterator.empty
          else {
            val c = bc.value
            val k = c(0).length
            val s = Array.ofDim[Double](m, k, dsub)
            val n = Array.ofDim[Long](m, k)
            it.foreach { e =>
              var sub = 0
              while (sub < m) {
                val cell = nearestSub(c(sub), e, sub * dsub)
                n(sub)(cell) += 1
                var j = 0
                while (j < dsub) { s(sub)(cell)(j) += e(sub * dsub + j); j += 1 }
                sub += 1
              }
            }
            Iterator.single((s, n))
          }
        }.treeReduce { (a, b) =>
          var sub = 0
          while (sub < a._1.length) {
            var c = 0
            while (c < a._1(sub).length) {
              val sa = a._1(sub)(c)
              val sb = b._1(sub)(c)
              var j = 0
              while (j < sa.length) { sa(j) += sb(j); j += 1 }
              a._2(sub)(c) += b._2(sub)(c)
              c += 1
            }
            sub += 1
          }
          a
        }
        val next = cb.map(_.map(_.clone()))
        for (sub <- 0 until m; c <- cb(sub).indices if counts(sub)(c) > 0) {
          var j = 0
          while (j < dsub) {
            next(sub)(c)(j) = sums(sub)(c)(j) / counts(sub)(c)
            j += 1
          }
        }
        bc.unpersist()
        cb = next
      }
      cb
    } finally vecs.unpersist(blocking = false)
  }

  /** Nearest centroid of one subspace, reading `e` at `off`. */
  private def nearestSub(cents: Array[Array[Double]], e: Seq[Float],
      off: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var s = 0.0
      var j = 0
      while (j < c.length) { val d = c(j) - e(off + j); s += d * d; j += 1 }
      if (s < bestD) { bestD = s; best = i }
      i += 1
    }
    best
  }

  /** `m`-byte PQ code of one vector (byte = unsigned centroid id). */
  def encodeVec(cb: Codebooks, e: Seq[Float]): Array[Byte] = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val out = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      out(sub) = (nearestSub(cb(sub), e, sub * dsub) & 0xff).toByte
      sub += 1
    }
    out
  }

  /** The compressed index: `(id, code binary)` — m bytes per vector. */
  def encode(corpus: DataFrame, cb: Codebooks): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(cb)
    val enc = udf((e: Seq[Float]) => encodeVec(bc.value, e))
    corpus.select(col("id"), enc(col("embedding")).as("code"))
  }

  /** Decode a code back to its centroid concatenation (test/debug use —
    * reconstruction error is what PQ trades for the 4·dim/m compression).
    */
  def decodeVec(cb: Codebooks, code: Array[Byte]): Array[Double] = {
    val dsub = cb(0)(0).length
    val out = new Array[Double](cb.length * dsub)
    var sub = 0
    while (sub < cb.length) {
      System.arraycopy(cb(sub)(code(sub) & 0xff), 0, out, sub * dsub, dsub)
      sub += 1
    }
    out
  }

  /** PQ top-k with exact rerank. `codes` lets a caller reuse a
    * pre-encoded index (the production shape: encode once, query many);
    * otherwise the corpus is encoded on the fly.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 4, ksub: Int = 32, iters: Int = 3, rerankFactor: Int = 4,
      excludeSelf: Boolean = true,
      codebooks: Option[Codebooks] = None,
      codes: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    val cb = codebooks.getOrElse(trainCodebooks(corpus, m, ksub, iters))
    val bc = spark.sparkContext.broadcast(cb)
    val codeDf = codes.getOrElse(encode(corpus, cb))
      .select(col("id").as("neighbor_id"), col("code"))

    // per-query ADC tables: dots(sub*ksub + c) = q_sub · cent(sub)(c),
    // nrm2(sub*ksub + c) = ||cent(sub)(c)||² — O(m·ksub·dsub) once per
    // query, then every (query, code) pair is O(m) table lookups
    val kk = cb(0).length
    val dotTab = udf((e: Seq[Float]) => {
      val c = bc.value
      val dsub = c(0)(0).length
      val t = new Array[Double](c.length * kk)
      for (sub <- c.indices; cc <- 0 until kk) {
        var s = 0.0
        var j = 0
        while (j < dsub) { s += c(sub)(cc)(j) * e(sub * dsub + j); j += 1 }
        t(sub * kk + cc) = s
      }
      t
    })
    val nrm2Tab = typedLit(cb.flatMap(_.map(cent =>
      cent.map(x => x * x).sum)).toSeq)
    val q = broadcast(queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"),
      VectorFunctions.l2Norm(col("embedding")).as("q_nrm"),
      dotTab(col("embedding")).as("q_tab")))

    val score = udf((code: Array[Byte], tab: Seq[Double], nrm2: Seq[Double],
        qnrm: Double) => {
      var dot = 0.0
      var n2 = 0.0
      var sub = 0
      while (sub < code.length) {
        val idx = sub * kk + (code(sub) & 0xff)
        dot += tab(idx)
        n2 += nrm2(idx)
        sub += 1
      }
      val den = qnrm * math.sqrt(n2)
      if (den > 0) dot / den else 0.0
    })
    val approx = codeDf.crossJoin(q)
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", score(col("code"), col("q_tab"), nrm2Tab, col("q_nrm")))
    val shortlist = Similarity.topKMerge(approx, k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))

    // exact rerank of the shortlist: join raw embeddings back (the
    // shortlist is |Q|·k·rerankFactor rows — broadcastable by design)
    val c = corpus.select(col("id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      VectorFunctions.l2Norm(col("embedding")).as("c_nrm"))
    val qe = broadcast(queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"),
      VectorFunctions.l2Norm(col("embedding")).as("q_nrm")))
    val exact = c.join(broadcast(shortlist), Seq("neighbor_id"))
      .join(qe, Seq("query_id"))
      .withColumn("sim", VectorFunctions.dot(col("q_emb"), col("c_emb")) /
        (col("q_nrm") * col("c_nrm")))
    Similarity.topKMerge(exact, k)
  }
}
