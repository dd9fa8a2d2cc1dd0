package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All fixed-length character-gram hashes of a text column in ONE pass:
  * element `i` (0-based) equals `xxhash64(substring(text, i+1, len))`,
  * for every gram start position `1 .. numChars-len+1`.
  *
  * This is the candidate-prefilter stage of the suffix-dedup family
  * ([[graft.operators.SuffixDedup]]), which only needs the 8-byte hash
  * per position — materializing the gram STRING there (what
  * `xxhash64(substring(...))` per exploded position does) allocates a
  * fresh ~len-byte string for every character of the corpus. Here the
  * hash runs directly over the in-place UTF-8 byte range: one boundary
  * scan records each codepoint's byte offset, then every gram hashes
  * `bytes[start(i) .. start(i+len))` with the SAME `XXH64` kernel and
  * seed (42) Spark's `xxhash64` uses — bitwise-identical results (a
  * spec pins parity against the substring form, multibyte included),
  * zero per-gram allocation.
  *
  * (CodegenFallback: a scalar fallback inside a codegen'd projection is
  * a single virtual call per row, not a stage break; the loop itself is
  * compiled Scala.)
  */
case class GramHashes(child: Expression, len: Int)
    extends UnaryExpression with CodegenFallback {

  require(len >= 1, "gram length must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // codepoint start offsets: starts(i) = byte offset of char i,
    // starts(n) = total bytes (so gram i spans starts(i)..starts(i+len))
    val n = s.numChars()
    if (n < len) return new GenericArrayData(Array.empty[Long])
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
    val out = new Array[Long](n - len + 1)
    var p = 0
    while (p <= n - len) {
      out(p) = XXH64.hashUnsafeBytes(
        base, off + starts(p), starts(p + len) - starts(p), 42L)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}
