package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Every word n-gram's PORTABLE 52-bit md5 hash and code-point length,
  * for all requested n's, in ONE pass over the document bytes: element
  * order is (for each n in `ns`, for each start word 0..numWords−n)
  * a struct `(n, h, glen)` where
  *
  *   - `h`    == `conv(substring(md5(to_binary(gram, 'utf-8')), 20, 13),
  *                16, 10)` — the engine-portable hash family every
  *                `*_portable` face and the DuckDB oracles replay
  *                (`('0x' || substr(md5(gram), 20, 13))::BIGINT`), and
  *   - `glen` == `length(gram)` (code points), with
  *   - `gram` == `concat_ws(" ", slice(split(text, " "), start, n))`.
  *
  * The equivalence that makes this zero-assembly: `split`-on-space and
  * `concat_ws`-with-space reconstruct the ORIGINAL byte run (empty
  * words from consecutive spaces round-trip, and 0x20 never occurs
  * inside a UTF-8 multibyte sequence), so every word n-gram is a byte
  * SLICE of the document — the md5 runs over `bytes[wordStart(i) ..
  * wordEnd(i+n-1))` directly and no gram string is ever materialized.
  * The composed-function form this replaces (in
  * [[graft.operators.CorpusOps.ngramRepetition]]) allocated the gram
  * via `slice` + `concat_ws`, then re-encoded it for `md5`, then
  * parsed hex via `substring` + `conv` — ~5 transient allocations per
  * gram occurrence, ~100M occurrences at sf1, dominating the query's
  * CPU+GC. A spec pins bitwise parity against the composed form on
  * multibyte / astral / consecutive-space / trailing-space fixtures
  * and seeded random corpora.
  *
  * Word splitting matches Spark `split(text, " ")` with its default
  * `limit = -1`: trailing empty words are KEPT (`"a " → ["a", ""]`),
  * every delimiter contributes a boundary, `numWords = delims + 1`.
  *
  * (CodegenFallback: a scalar fallback inside a codegen'd projection
  * is a single virtual call per row, not a stage break — the
  * [[GramHashes]] precedent.)
  */
case class WordGramMd5(child: Expression, ns: Seq[Int])
    extends UnaryExpression with CodegenFallback {

  require(ns.nonEmpty, "need at least one gram size")
  require(ns.forall(_ >= 1), s"gram sizes must be >= 1, got $ns")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false),
    StructField("glen", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "word_gram_md5"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val nBytes = bytes.length
    // word k spans bytes [starts(k), starts(k+1) - 1) for k < numWords-1
    // (the -1 drops the delimiter); the last word ends at nBytes.
    // starts(k) = 0 for k == 0, else (position of delim k-1) + 1.
    var delims = 0
    var b = 0
    while (b < nBytes) {
      if (bytes(b) == 0x20) delims += 1
      b += 1
    }
    val numWords = delims + 1
    val starts = new Array[Int](numWords + 1)
    var w = 1
    b = 0
    while (b < nBytes) {
      if (bytes(b) == 0x20) { starts(w) = b + 1; w += 1 }
      b += 1
    }
    starts(numWords) = nBytes + 1 // uniform end formula below
    // Long accumulate + loud bound: |ns| × ~2^31 grams would wrap an
    // Int counter and under-allocate `out` (silent corruption); the
    // doc-wise contract is pre-chunking pathological docs
    var totalL = 0L
    ns.foreach { n => if (numWords >= n) totalL += numWords.toLong - n + 1 }
    require(totalL < Int.MaxValue - 8,
      s"document yields $totalL grams across n=$ns; pre-chunk it via " +
        "CorpusOps.chunkDocuments before doc-local gram hashing")
    val out = new Array[Any](totalL.toInt)
    val digest = WordGramMd5.localMd5.get()
    var o = 0
    ns.foreach { n =>
      var i = 0
      while (i + n <= numWords) {
        val from = starts(i)
        // end of word i+n-1: next start minus the delimiter byte
        val until = starts(i + n) - 1
        digest.reset()
        digest.update(bytes, from, until - from)
        val d = digest.digest()
        // hex chars 20..32 of the 32-char digest = low nibble of byte 9
        // then bytes 10..15 — 52 bits, always a non-negative long
        val h = ((d(9) & 0x0FL) << 48) |
          ((d(10) & 0xFFL) << 40) | ((d(11) & 0xFFL) << 32) |
          ((d(12) & 0xFFL) << 24) | ((d(13) & 0xFFL) << 16) |
          ((d(14) & 0xFFL) << 8) | (d(15) & 0xFFL)
        // code points in the gram bytes: non-continuation bytes
        var glen = 0L
        var p = from
        while (p < until) {
          if ((bytes(p) & 0xC0) != 0x80) glen += 1
          p += 1
        }
        out(o) = new GenericInternalRow(
          Array[Any](n, h, glen)): InternalRow
        o += 1
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordGramMd5 = copy(child = newChild)
}

object WordGramMd5 {
  /** MessageDigest is stateful and not thread-safe; one per task
    * thread, reset per gram (shared with [[WordGramRepStats]]). */
  private[expressions] val localMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
