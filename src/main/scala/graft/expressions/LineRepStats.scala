package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document line/paragraph repetition sufficient statistics, doc-
  * locally, in one pass: for units `line` (split on `"\n"`) and `para`
  * (split on `"\n\n"`), the struct
  * `(n_lines, dist_lines, dup_line_chars, tot_line_chars,
  *   n_paras, dist_paras, dup_para_chars, tot_para_chars)` where
  * units group by EXACT bytes, `dup_*_chars = Σ (count−1)·len` over
  * duplicated units and `tot_*_chars = Σ count·len` (len in code
  * points) — the [[graft.operators.CorpusOps.lineRepetition]]
  * sufficient statistics, computed without the corpus-wide
  * (doc, unit-string) exchange whose key never crosses documents.
  *
  * Split semantics replicate Spark `split(text, sep)` with its
  * default `limit = -1`: separators match LEFT-TO-RIGHT and
  * NON-OVERLAPPING (so `"a\n\n\nb"` splits on `"\n\n"` into
  * `["a", "\nb"]`), trailing empty units are kept, and `numUnits =
  * matches + 1`. Grouping is string-exact via [[SpanGroups]] (the
  * DuckDB oracle groups by the unit STRING — no hash semantics may
  * leak into results); a spec pins equality against the relational
  * chain.
  *
  * (CodegenFallback: single virtual call per row — the
  * [[GramHashes]]/[[WordRepStats]] precedent.)
  */
case class LineRepStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    "n_lines", "dist_lines", "dup_line_chars", "tot_line_chars",
    "n_paras", "dist_paras", "dup_para_chars", "tot_para_chars")
    .map(StructField(_, LongType, nullable = false)))

  override def prettyName: String = "line_rep_stats"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Any](8)
    var slot = 0
    Seq(1, 2).foreach { sepLen => // "\n" and "\n\n"
      // left-to-right non-overlapping separator matches (regex-split
      // parity); unit i spans [from(i), until(i))
      val fromB = new java.util.ArrayList[Int]()
      fromB.add(0)
      val untilB = new java.util.ArrayList[Int]()
      var b = 0
      while (b + sepLen <= bytes.length) {
        var isSep = bytes(b) == 0x0A
        if (isSep && sepLen == 2) isSep = bytes(b + 1) == 0x0A
        if (isSep) {
          untilB.add(b)
          fromB.add(b + sepLen)
          b += sepLen
        } else b += 1
      }
      untilB.add(bytes.length)
      val n = fromB.size
      val from = new Array[Int](n)
      val until = new Array[Int](n)
      var i = 0
      while (i < n) { from(i) = fromB.get(i); until(i) = untilB.get(i); i += 1 }
      var dist = 0L
      var dupChars = 0L
      var totChars = 0L
      SpanGroups.foreachGroup(bytes, from, until, n) { (idx, c) =>
        val len = SpanGroups.codePoints(bytes, from(idx), until(idx))
        dist += 1
        dupChars += (c - 1L) * len
        totChars += c * len
      }
      out(slot) = n.toLong; out(slot + 1) = dist
      out(slot + 2) = dupChars; out(slot + 3) = totChars
      slot += 4
    }
    new GenericInternalRow(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LineRepStats = copy(child = newChild)
}
