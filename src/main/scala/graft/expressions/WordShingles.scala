package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column — the first stage of
  * every document-dedup operator (MinHash, exact Jaccard), so it runs
  * over the full corpus.
  *
  * Semantics are EXACTLY the HOF chain it replaces
  * (`TextFunctions.wordShinglesHof`): tokens = `split(text, " ")` with
  * Java `String.split(" ", -1)` edge behavior (consecutive spaces yield
  * empty tokens), shingles joined with a single space, incomplete
  * trailing shingles dropped, distinct keeps first occurrence. The HOF
  * form interprets three lambda passes with per-element closure
  * dispatch and intermediate arrays; this is one primitive loop per row.
  * (CodegenFallback: a scalar fallback inside a codegen'd projection is
  * a single virtual call per row, not a stage break.)
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    // same tokenization as Spark's split(text, " ") (Java regex split,
    // limit -1): a literal-space pattern has no metacharacters, so
    // String.split(" ", -1) matches exactly
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(
      seen.iterator.map(s => UTF8String.fromString(s): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
