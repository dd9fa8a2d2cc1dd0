package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** [[GramHashes]] with a SECOND independently-seeded xxhash64 per gram,
  * both computed in the same single byte pass: element `i` is
  * `(h, h2)` where `h = xxhash64(gram_i, seed=42)` (bitwise-identical
  * to Spark's `xxhash64`, the pairing key) and
  * `h2 = xxhash64(gram_i, seed2)`.
  *
  * Purpose: the suffix pre-cap counts DISTINCT DOCS PER HASH BUCKET
  * ([[graft.operators.SuffixDedup.cappedPostings]]) without ever
  * allocating gram strings — so when a bucket is dropped for exceeding
  * the cap, the hash alone cannot say whether the drop was an
  * INTENTIONAL over-cap exclusion (one gram, genuinely shared by more
  * docs than the cap) or COLLISION SHRAPNEL (two distinct grams whose
  * 64-bit hashes collide, each under-cap, merged past it — the
  * accepted ~2⁻⁶⁴ trade documented on `spanPairs`). `h2` is that
  * discriminator: distinct grams inside an `h` bucket have distinct
  * `h2` with the same 2⁻⁶⁴ failure odds, so `count(distinct h2) >= 2`
  * flags the collision class without shuffling a single gram string.
  *
  * (CodegenFallback: single virtual call per row, loop is compiled
  * Scala — the [[GramHashes]] precedent.)
  */
case class GramHashPairs(child: Expression, len: Int, seed2: Long)
    extends UnaryExpression with CodegenFallback {

  require(len >= 1, "gram length must be >= 1")
  require(seed2 != 42L,
    "seed2 must differ from the primary seed 42 or h2 degenerates to h")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "gram_hash_pairs"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numChars()
    if (n < len) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](n + 1)
    var i = 0
    var b = 0
    while (b < nBytes) {
      starts(i) = b
      b += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + b))
      i += 1
    }
    starts(n) = nBytes
    val out = new Array[Any](n - len + 1)
    var p = 0
    while (p <= n - len) {
      val from = off + starts(p)
      val nb = starts(p + len) - starts(p)
      out(p) = new GenericInternalRow(Array[Any](
        XXH64.hashUnsafeBytes(base, from, nb, 42L),
        XXH64.hashUnsafeBytes(base, from, nb, seed2))): InternalRow
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): GramHashPairs = copy(child = newChild)
}
