package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane LSH bucket key over an `array<float>` embedding —
  * the bucketing step of every LSH operator (ANN probe index, embedding
  * near-dup sub-blocking, the materialized index writer).
  *
  * Bitwise-equal to the HOF formulation
  * (`VectorFunctions.randomHyperplaneKeyHof`): per plane `p`, the
  * projection is the left-to-right double sum of `x(i) * sign(p, i)`
  * where `sign(p, i) = ±1` from bit 0 of `xxhash64("$seed:$p:$i")`
  * (Spark's xxhash64, seed 42); bucket bit `p` is set when the
  * projection is positive.
  *
  * The win: the signs are DATA-INDEPENDENT, but the HOF form re-derives
  * them per row — `nPlanes × dim` string hashes per row under
  * interpreted lambda dispatch. Here the sign matrix is computed once per
  * (task, dim) and each row costs `nPlanes × dim` multiply-adds.
  */
case class RandomHyperplaneKey(child: Expression, nPlanes: Int, seed: Int)
    extends UnaryExpression with CodegenFallback {

  require(nPlanes >= 1 && nPlanes <= 63, "nPlanes must be in [1, 63]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "random_hyperplane_key"

  // sign matrix cache, keyed by dim. ONE volatile holder pairing the dim
  // with its matrix: two separate fields could interleave when a shared
  // expression instance sees arrays of different dims (one thread's dim
  // published against another thread's matrix). A single immutable tuple
  // makes any race benign — a reader either sees a matching (dim, matrix)
  // pair or recomputes idempotently.
  @transient @volatile private var cache: (Int, Array[Array[Double]]) = _

  private def signMatrix(dim: Int): Array[Array[Double]] = {
    val c = cache
    if (c != null && c._1 == dim) return c._2
    val m = Array.ofDim[Double](nPlanes, dim)
    var p = 0
    while (p < nPlanes) {
      var i = 0
      while (i < dim) {
        val key = UTF8String.fromString(s"$seed:$p:$i")
        val h = XXH64.hashUTF8String(key, 42L)
        m(p)(i) = if ((h & 1L) == 1L) 1.0 else -1.0
        i += 1
      }
      p += 1
    }
    cache = (dim, m)
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val m = signMatrix(dim)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val row = m(p)
      var proj = 0.0
      var i = 0
      while (i < dim) {
        proj += arr.getFloat(i).toDouble * row(i)
        i += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): RandomHyperplaneKey =
    copy(child = newChild)
}
