package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the dimensionality-reduction step that
  * fronts ANN at scale (project 1536-d vectors to 128-d before LSH/IVF;
  * also the rotation PQ literature applies before product quantization).
  *
  * Scale shape: the corpus-side work is ONE `mapPartitions` kernel
  * accumulating per-partition (count, Σx, Σxxᵀ) in primitive arrays,
  * merged with `treeReduce` — the driver sees a single (dim × dim)
  * matrix regardless of partition count (same pattern as
  * [[IvfAnn.trainCentroids]]). The eigendecomposition runs driver-side
  * on that dim×dim covariance (cyclic Jacobi — symmetric, deterministic
  * sweep order); projection broadcasts the (k × dim) components and is
  * map-side only.
  */
object EmbeddingPca {

  /** mean(dim), components(k)(dim) — orthonormal rows, eigenvalue-desc —
    * and the full eigenvalue spectrum for variance accounting.
    */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def explainedVariance(k: Int): Double = {
      val t = eigenvalues.sum
      if (t <= 0) 0.0 else eigenvalues.take(k).sum / t
    }
  }

  /** Fit a `k`-component model. One pass over the corpus. */
  def fit(df: DataFrame, embCol: String, k: Int): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val rdd = df.select(col(embCol)).as[Array[Float]].rdd
    val (n, s, ss) = rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        val d = first.length
        var cnt = 1L
        val sum = new Array[Double](d)
        val sumSq = new Array[Double](d * d)
        def add(e: Array[Float]): Unit = {
          var i = 0
          while (i < d) {
            val xi = e(i).toDouble
            sum(i) += xi
            var j = 0
            while (j < d) { sumSq(i * d + j) += xi * e(j); j += 1 }
            i += 1
          }
        }
        add(first)
        it.foreach { e => cnt += 1; add(e) }
        Iterator.single((cnt, sum, sumSq))
      }
    }.treeReduce { (a, b) =>
      var i = 0
      while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
      i = 0
      while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
      (a._1 + b._1, a._2, a._3)
    }
    val d = s.length
    require(k >= 1 && k <= d, s"k must be in [1, $d]")
    val mean = s.map(_ / n)
    // covariance = E[xxT] - mean meanT
    val cov = Array.tabulate(d, d)((i, j) => ss(i * d + j) / n - mean(i) * mean(j))
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => (-values(i), i))
    Model(mean,
      order.take(k).map(i => vectors.map(_(i))).toArray,
      order.map(values(_)).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Deterministic: fixed (p, q) sweep order, fixed sweep count bound.
    */
  private[operators] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1.0, a.map(r => r.map(math.abs).max).max)
    while (sweep < 64 && off > tol) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > 0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) match {
          case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val sn = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - sn * aiq
          a(i)(q) = sn * aip + c * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - sn * aqi
          a(q)(i) = sn * api + c * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - sn * viq
          v(i)(q) = sn * vip + c * viq
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Project embeddings: `y = components · (x − mean)`, float output so
    * the result composes with every ANN operator. Broadcast + map-side.
    */
  def transform(df: DataFrame, embCol: String, model: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val proj = udf((e: Seq[Float]) => {
      val m = bc.value
      val d = m.mean.length
      val out = new Array[Float](m.components.length)
      var kk = 0
      while (kk < m.components.length) {
        val comp = m.components(kk)
        var s = 0.0
        var i = 0
        while (i < d) { s += comp(i) * (e(i) - m.mean(i)); i += 1 }
        out(kk) = s.toFloat
        kk += 1
      }
      out
    })
    df.withColumn(embCol, proj(col(embCol)))
  }
}
