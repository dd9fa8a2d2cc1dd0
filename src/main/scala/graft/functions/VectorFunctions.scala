package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector math over `Array[Float]` columns, for the similarity /
  * near-dup operators (north star in BASELINE.json).
  *
  * All pure higher-order-function compositions (codegen'd, no UDF). Floats
  * are widened to double BEFORE multiplying: a float×float product is exact
  * in double (24-bit mantissas), and the sequential left-to-right `aggregate`
  * accumulation makes results bit-reproducible across engines — which is
  * what lets the DuckDB oracle hash-match cosine similarities exactly.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double.
    * Backed by the codegen'd [[graft.expressions.FloatDotProduct]] — the
    * HOF formulation ([[dotHof]]) is CodegenFallback and pays an
    * interpreted lambda per element; values are bitwise identical.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.FloatDotProduct(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** HOF reference formulation of [[dot]] (kept as the semantic spec the
    * native expression is tested against).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast(DoubleType) - y.cast(DoubleType)
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Deterministic pseudo-random hyperplane sign for random-projection LSH:
    * the sign of xxhash64 of (plane index, component index) weights each
    * vector component ±1. Gives `nPlanes` sign bits packed into a long —
    * the ANN bucket key. No RNG state, fully reproducible. Backed by the
    * native [[graft.expressions.RandomHyperplaneKey]], which caches the
    * data-independent sign matrix per task instead of re-deriving it by
    * string hashing per row ([[randomHyperplaneKeyHof]] is the semantic
    * spec it is tested against).
    */
  def randomHyperplaneKey(vec: Column, nPlanes: Int, seed: Int = 0): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.RandomHyperplaneKey(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        nPlanes, seed))

  /** ENGINE-PORTABLE hyperplane key: same sign-bit construction as
    * [[randomHyperplaneKey]] but the data-independent ±1 sign matrix
    * derives from the md5-52 hash family (`sign(p, d) = ±1` by the low
    * bit of `md5("p:d")`'s 52-bit tail) instead of xxhash64 — so the
    * bucketing is exactly reproducible in any ANSI engine (DuckDB:
    * `('0x' || substr(md5(p || ':' || d), 20, 13))::BIGINT & 1`). The
    * per-plane projection folds components in index order over doubles,
    * matching `list_aggregate(list_transform(...), 'sum')` bitwise — the
    * certified [[dot]] / bm25 fold pattern. Production LSH stays on
    * [[randomHyperplaneKey]] (native expression, cached sign matrix).
    */
  def portableHyperplaneKey(vec: Column, nPlanes: Int,
      maxDims: Int = 512): Column = {
    // the sign matrix is DATA-INDEPENDENT — derive it once driver-side
    // (plain MessageDigest md5, byte-identical to Spark's/DuckDB's md5 of
    // the same utf-8 string) and ship it as array literals, instead of
    // evaluating nPlanes × dims md5 expressions per ROW (measured 9.8s →
    // sub-second on the sf1 registry bench). `slice` trims each literal
    // to the vector's length; vectors longer than maxDims would zip
    // against null signs, so they are rejected by construction here.
    def h52(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(19, 32), 16)
    }
    (0 until nPlanes).map { p =>
      val signs: Seq[Double] = (0 until maxDims)
        .map(d => if ((h52(s"$p:$d") & 1L) == 1L) 1.0 else -1.0)
      val proj = aggregate(
        zip_with(vec, slice(typedLit(signs), lit(1), size(vec)),
          (x, s) => x.cast(DoubleType) * s),
        lit(0.0), (acc, v) => acc + v)
      when(size(vec) > maxDims,
          raise_error(lit(s"portableHyperplaneKey: vector has more than " +
            s"maxDims=$maxDims components")).cast(LongType))
        .otherwise(when(proj > 0, lit(1L << p)).otherwise(lit(0L)))
    }.reduce((a, x) => a.bitwiseOR(x))
  }

  /** HOF reference formulation of [[randomHyperplaneKey]]. */
  def randomHyperplaneKeyHof(vec: Column, nPlanes: Int, seed: Int = 0): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        transform(vec, (x, i) => {
          val sign = when(
            xxhash64(concat(lit(s"$seed:$p:"), i.cast(StringType)))
              .bitwiseAND(lit(1L)) === 1L, lit(1.0)).otherwise(lit(-1.0))
          x.cast(DoubleType) * sign
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, x) => a.bitwiseOR(x))
}
