package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension int8) embedding quantization — the third
  * compression point on the ANN storage curve: raw float32 (4·dim) →
  * SQ8 (dim bytes, this file) → PQ (m bytes, [[ProductQuantizer]]).
  * SQ8 keeps one byte PER DIMENSION with a per-dim affine map
  * `x ≈ min + scale · b`, so approximate dots stay O(dim) byte
  * multiply-adds with far lower distortion than PQ at 4× compression —
  * the FAISS `SQ8` / HNSW-SQ tradeoff.
  *
  * Fit is ONE aggregation pass (per-dim min/max in a primitive-array
  * `mapPartitions` kernel merged with `treeReduce`) and is exactly
  * deterministic — min/max have no float-associativity wobble, unlike
  * k-means — so SQ8 outputs golden-pin cleanly.
  *
  * Query scoring decomposes `dot(q, x̂) = Σᵢ qᵢ·minᵢ + Σᵢ (qᵢ·scaleᵢ)·bᵢ`:
  * the first term and the scaled query fold once per query; each
  * candidate then costs dim byte lookups. Stored exact norms keep the
  * cosine denominator exact; top `k × rerankFactor` rerank against raw
  * embeddings, so recall is monotone in `rerankFactor`.
  */
object ScalarQuantizer {

  /** Per-dimension affine codebook: `x ≈ min + scale · byte`. */
  final case class Model(mins: Array[Double], scales: Array[Double])

  /** One-pass per-dim min/max fit. */
  def fit(df: DataFrame, embCol: String): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val (mins, maxs) = df.select(col(embCol)).as[Array[Float]].rdd
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          val lo = first.map(_.toDouble)
          val hi = first.map(_.toDouble)
          it.foreach { e =>
            var i = 0
            while (i < lo.length) {
              val x = e(i).toDouble
              if (x < lo(i)) lo(i) = x
              if (x > hi(i)) hi(i) = x
              i += 1
            }
          }
          Iterator.single((lo, hi))
        }
      }.treeReduce { (a, b) =>
        var i = 0
        while (i < a._1.length) {
          if (b._1(i) < a._1(i)) a._1(i) = b._1(i)
          if (b._2(i) > a._2(i)) a._2(i) = b._2(i)
          i += 1
        }
        a
      }
    Model(mins, mins.indices.map { i =>
      val r = maxs(i) - mins(i)
      if (r > 0) r / 255.0 else 1.0
    }.toArray)
  }

  /** Quantize one vector to dim bytes (unsigned, rounded to nearest). */
  def encodeVec(m: Model, e: Seq[Float]): Array[Byte] = {
    val out = new Array[Byte](m.mins.length)
    var i = 0
    while (i < out.length) {
      // clamp on the Long — a .toInt here would WRAP for |q| > 2^31
      // (tiny trained scale + huge outlier) and encode an extreme
      // vector to an in-range byte instead of the boundary code
      val q = math.round((e(i) - m.mins(i)) / m.scales(i))
      out(i) = (math.min(255L, math.max(0L, q)) & 0xffL).toByte
      i += 1
    }
    out
  }

  def decodeVec(m: Model, code: Array[Byte]): Array[Double] =
    Array.tabulate(m.mins.length)(i =>
      m.mins(i) + m.scales(i) * (code(i) & 0xff))

  /** The compressed index: `(id, code binary, nrm)` — dim bytes + one
    * exact norm per vector.
    */
  def encode(corpus: DataFrame, m: Model): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(m)
    val enc = udf((e: Seq[Float]) => encodeVec(bc.value, e))
    corpus.select(col("id"), enc(col("embedding")).as("code"),
      graft.functions.VectorFunctions.l2Norm(col("embedding")).as("nrm"))
  }

  /** Materialize the SQ8 index at `path`: codes beside the serialized
    * per-dim codebook — the served form of [[encode]], mirroring
    * [[IvfPq.writeIndex]] so the drift loop has a standing artifact to
    * append to ([[appendToIndex]]) and rebuild in place
    * ([[rebuildIndex]]). Codes need no partitioning column: every probe
    * scans them once against a broadcast query fold (O(dim) bytes per
    * row), so the scan IS the plan — there is no cell/bucket to prune.
    */
  def writeIndex(corpus: DataFrame, model: Model, path: String): Unit = {
    encode(corpus, model).write.mode("overwrite").parquet(s"$path/codes")
    writeModel(corpus.sparkSession, model, path)
  }

  /** Serialize just the codebook beside a codes store. */
  def writeModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    Seq((0, model.mins.toSeq), (1, model.scales.toSeq)).toDF("kind", "vec")
      .repartition(1).write.mode("overwrite").parquet(s"$path/model")
  }

  /** Reload a [[writeIndex]] codebook. */
  def readModel(spark: SparkSession, path: String): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/model")
      .as[(Int, Seq[Double])].collect()
    Model(rows.find(_._1 == 0).get._2.toArray,
      rows.find(_._1 == 1).get._2.toArray)
  }

  /** Append NEW vectors encoded against the FROZEN codebook — the
    * daily-ingest shape ([[graft.operators.IvfPq.appendToIndex]]'s
    * contract): appended data beyond the trained per-dim range
    * saturates to the boundary code, degrading recall but never
    * correctness; [[clipCensus]] / [[sqDriftReport]] measure the
    * staleness, [[rebuildIndex]] is the response. Append atomicity is
    * parquet's; replay dedup is the caller's.
    */
  def appendToIndex(batch: DataFrame, spark: SparkSession,
      path: String): Unit = {
    val mdl = readModel(spark, path)
    encode(batch, mdl).write.mode("append").parquet(s"$path/codes")
  }

  /** The rebuild RESPONSE to a [[sqDriftReport]] `rebuild = true` (r16
    * verdict #1): re-fit the per-dim `[min, max]` codebook over the
    * GROWN corpus, re-encode everything, re-serve in place. The fit is
    * exactly deterministic (min/max — no float-associativity wobble),
    * so the rebuilt index is bit-identical to a fresh [[writeIndex]]
    * over the same corpus, and the post-rebuild [[clipCensus]] is zero
    * BY CONSTRUCTION (the new range covers every corpus vector).
    * Returns the new model so a server can swap its frozen copy. Not
    * atomic against concurrent probes — maintenance cadence.
    */
  def rebuildIndex(corpus: DataFrame, path: String): Model = {
    val mdl = fit(corpus, "embedding")
    writeIndex(corpus, mdl, path)
    mdl
  }

  /** SQ8 top-k with exact rerank; pass `model`/`codes` to reuse a built
    * index across query batches.
    */
  def sqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      rerankFactor: Int = 4, excludeSelf: Boolean = true,
      model: Option[Model] = None, codes: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    val mdl = model.getOrElse(fit(corpus, "embedding"))
    val bc = spark.sparkContext.broadcast(mdl)
    val codeDf = codes.getOrElse(encode(corpus, mdl))
      .select(col("id").as("neighbor_id"), col("code"), col("nrm").as("c_nrm"))

    // per-query fold: base = Σ qᵢ·minᵢ, qs = (qᵢ·scaleᵢ) vector
    val qFold = udf((e: Seq[Float]) => {
      val m = bc.value
      var base = 0.0
      val qs = new Array[Double](m.mins.length)
      var i = 0
      while (i < qs.length) {
        base += e(i) * m.mins(i)
        qs(i) = e(i) * m.scales(i)
        i += 1
      }
      (base, qs)
    })
    val q = broadcast(queries.select(col("id").as("query_id"),
      graft.functions.VectorFunctions.l2Norm(col("embedding")).as("q_nrm"),
      qFold(col("embedding")).as("qf"))
      .select(col("query_id"), col("q_nrm"),
        col("qf._1").as("q_base"), col("qf._2").as("q_scaled")))

    val score = udf((code: Array[Byte], base: Double, qs: Seq[Double],
        qnrm: Double, cnrm: Double) => {
      var dot = base
      var i = 0
      while (i < code.length) { dot += qs(i) * (code(i) & 0xff); i += 1 }
      val den = qnrm * cnrm
      if (den > 0) dot / den else 0.0
    })
    val approx = codeDf.crossJoin(q)
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", score(col("code"), col("q_base"), col("q_scaled"),
        col("q_nrm"), col("c_nrm")))
    val shortlist = Similarity.topKMerge(approx, k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))

    val c = corpus.select(col("id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      graft.functions.VectorFunctions.l2Norm(col("embedding")).as("c_nrm"))
    val qe = broadcast(queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"),
      graft.functions.VectorFunctions.l2Norm(col("embedding")).as("q_nrm")))
    val exact = c.join(broadcast(shortlist), Seq("neighbor_id"))
      .join(qe, Seq("query_id"))
      .withColumn("sim",
        graft.functions.VectorFunctions.dot(col("q_emb"), col("c_emb")) /
          (col("q_nrm") * col("c_nrm")))
    Similarity.topKMerge(exact, k)
  }

  /** Staleness gate for a frozen SQ8 codebook under appends (r15
    * verdict #6 — [[graft.operators.IvfPq.driftReport]]'s shape). The
    * model IS trainable state here (per-dim `[min, max]` fitted at
    * build time), so drift has a direct, cheap witness: `clip_rate`,
    * the fraction of corpus vectors with at least one dimension whose
    * nearest code falls outside `[0, 255]` — appended data beyond the
    * trained range saturates to the boundary code and its quantized
    * similarity stops ranking (the exact rerank can only salvage what
    * the saturated shortlist still contains). Alongside it, measured
    * recall of [[sqTopK]] under the frozen `model` against
    * [[Similarity.bruteForceTopK]] on a probe sample. `rebuild` fires
    * when recall sinks below `recallFloor` or `clip_rate` exceeds
    * `maxClipRate` — re-fit the codebook over the grown corpus.
    */
  /** The clip census alone — `(n_vecs, n_clipped)` over `corpus` under
    * the frozen `model` (a vector clips when any dimension's nearest
    * code falls outside `[0, 255]`). One scan, map-side; the cheap
    * half of [[sqDriftReport]], exposed for the `q_sq_clip_census`
    * oracle face (exact integer arithmetic end-to-end: min/max fit,
    * `floor(x + 0.5)` rounding, boundary compares).
    */
  def clipCensus(corpus: DataFrame, model: Model): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(model)
    val clipsUdf = udf((e: Seq[Float]) => {
      val m = bc.value
      var i = 0
      var clipped = false
      while (i < m.mins.length && !clipped) {
        // compare the Long (ADVICE r16): .toInt wraps for |q| > 2^31,
        // so an extreme outlier could wrap back into [0, 255], evade
        // the one witness recall sampling can miss, and diverge from
        // the q_sq_clip_census DuckDB oracle's BIGINT arithmetic
        val q = math.round((e(i) - m.mins(i)) / m.scales(i))
        if (q < 0L || q > 255L) clipped = true
        i += 1
      }
      if (clipped) 1L else 0L
    })
    corpus.agg(count(lit(1)).as("n_vecs"),
      coalesce(sum(clipsUdf(col("embedding"))), lit(0L)).as("n_clipped"))
  }

  def sqDriftReport(probeQueries: DataFrame, corpus: DataFrame,
      model: Model, k: Int, rerankFactor: Int = 4,
      recallFloor: Double = 0.9, maxClipRate: Double = 0.01,
      codes: Option[DataFrame] = None): DataFrame = {
    require(recallFloor > 0.0 && recallFloor <= 1.0,
      s"recallFloor must be in (0, 1], got $recallFloor")
    require(maxClipRate >= 0.0 && maxClipRate < 1.0,
      s"maxClipRate must be in [0, 1), got $maxClipRate")
    val clipAgg = clipCensus(corpus, model)
    val approx = sqTopK(probeQueries, corpus, k, rerankFactor,
        excludeSelf = true, model = Some(model), codes = codes)
      .select(col("query_id"), col("neighbor_id"))
      .withColumn("__hit", lit(1L))
    val exactTop = Similarity.bruteForceTopK(probeQueries, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
    val nq = probeQueries.select(col("id")).distinct().count()
    exactTop
      .join(approx, Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_expected"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hits"))
      .crossJoin(clipAgg)
      .select(lit(nq).as("n_queries"), lit(k.toLong).as("k"),
        col("n_expected"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_expected").cast("double"))
          .as("recall"),
        col("n_vecs"), col("n_clipped"),
        (col("n_clipped").cast("double") / col("n_vecs").cast("double"))
          .as("clip_rate"))
      .withColumn("rebuild", col("recall") < recallFloor ||
        col("clip_rate") > maxClipRate)
  }
}
