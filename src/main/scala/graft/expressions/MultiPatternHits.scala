package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-pattern literal matcher (Aho–Corasick 1975): one
  * scan of the text finds, for EVERY pattern in the compiled set, its
  * greedy left-to-right non-overlapping occurrence count and its first
  * occurrence position — the blocklist primitive of a corpus-curation
  * pipeline (bad-word gates, boilerplate markers, contamination
  * canaries), where the naive `P` separate `instr`/`replace` passes
  * cost O(P·len) per document and the automaton costs O(len) whatever
  * the pattern count.
  *
  * Output: `array<struct<pid:long, first_pos:long, n_hits:long>>`, one
  * element per pattern with ≥1 hit, ascending pid. `first_pos` is
  * 1-based in CODE POINTS (the scan runs over UTF-16 units but carries
  * a code-point counter alongside, so supplementary-plane text — emoji,
  * astral CJK — positions agree with DuckDB's code-point `instr`).
  *
  * Count semantics are deliberately REPLACE-COUNT (greedy leftmost
  * non-overlapping, per pattern independently): `n_hits(p)` equals
  * `(length(t) - length(replace(t, p, ''))) / length(p)` and
  * `first_pos(p)` equals `instr(t, p)` — so every face built on this
  * expression is exactly expressible in ANSI SQL for the DuckDB
  * oracle, self-overlapping patterns included ("aaaa" vs "aa" counts
  * 2, not 3). Patterns match independently: "value" and "value table"
  * both count their own occurrences.
  *
  * Scale shape: the automaton compiles ONCE per executor (transient
  * lazy from the literal pattern list — pattern sets are operator
  * arguments, bounded by contract like the quality-model tables; a
  * 100k-pattern list still compiles in ms and ships inside the plan),
  * then evaluation is a pure per-row scalar scan — no shuffle, no
  * state, embarrassingly parallel over any partitioning.
  *
  * (CodegenFallback: same rationale as [[GramHashes]] — one virtual
  * call per row inside the codegen'd projection, the scan loop itself
  * is compiled Scala.)
  */
case class MultiPatternHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "pattern list must be non-empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pid", LongType, nullable = false),
    StructField("first_pos", LongType, nullable = false),
    StructField("n_hits", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "multi_pattern_hits"

  /** Goto/fail/output automaton over UTF-16 units. Node 0 is the root;
    * `next(node)` maps a char to the child node; `fail(node)` is the
    * longest proper suffix state; `outs(node)` lists every pattern id
    * whose string ends at this state (own + inherited via fail links,
    * flattened at build time so the scan never walks fail chains for
    * output).
    */
  @transient private lazy val automaton: (Array[java.util.HashMap[Character, Integer]],
      Array[Int], Array[Array[Int]]) = {
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { c =>
        val nx = next(node).get(c)
        node = if (nx != null) nx.intValue() else {
          next += new java.util.HashMap[Character, Integer]()
          ends += Nil
          next(node).put(c, next.size - 1)
          next.size - 1
        }
      }
      ends(node) ::= pid
    }
    val n = next.size
    val fail = new Array[Int](n)
    val outs = new Array[List[Int]](n)
    var i = 0
    while (i < n) { outs(i) = ends(i); i += 1 }
    val queue = new java.util.ArrayDeque[Int]()
    next(0).forEach((_, v) => queue.add(v))
    while (!queue.isEmpty) {
      val u = queue.poll()
      next(u).forEach { (c, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && next(f).get(c) == null) f = fail(f)
        val t = next(f).get(c)
        fail(v) = if (t != null && t != v) t.intValue() else 0
        outs(v) = outs(v) ++ outs(fail(v))
      }
    }
    (next.toArray, fail, outs.map(_.sorted.toArray))
  }

  /** Pattern lengths in CODE POINTS — the unit first_pos and the greedy
    * restart cursor are kept in, matching the oracle's instr/length.
    */
  @transient private lazy val patLensCp: Array[Int] =
    patterns.map(p => p.codePointCount(0, p.length)).toArray

  override def nullSafeEval(input: Any): Any = {
    val (next, fail, outs) = automaton
    val s = input.asInstanceOf[UTF8String].toString
    val nPat = patterns.size
    val lens = patLensCp
    val firstPos = new Array[Int](nPat) // 0 = unseen
    val counts = new Array[Long](nPat)
    // next occurrence of pattern pid may start at code point >= nextFree
    val nextFree = new Array[Int](nPat)
    var node = 0
    var i = 0
    // code points in s[0..i] once char i is processed: a surrogate PAIR
    // counts once (at its high unit); matches always end on a complete
    // code point, so cp is exact at every emission site. Greedy
    // accept/reject is order-isomorphic between code-unit and
    // code-point positions, so counts are unchanged vs a unit-based
    // cursor — only reported positions differ for astral text.
    var cp = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if (!(Character.isLowSurrogate(c) && i > 0 &&
          Character.isHighSurrogate(s.charAt(i - 1)))) cp += 1
      var nx = next(node).get(c)
      while (nx == null && node != 0) { node = fail(node); nx = next(node).get(c) }
      node = if (nx != null) nx.intValue() else 0
      val hits = outs(node)
      var j = 0
      while (j < hits.length) {
        val pid = hits(j)
        val start = cp - lens(pid) + 1 // 1-based code-point start
        if (start > nextFree(pid)) {
          counts(pid) += 1L
          if (firstPos(pid) == 0) firstPos(pid) = start
          nextFree(pid) = cp
        }
        j += 1
      }
      i += 1
    }
    val rows = (0 until nPat).iterator.filter(counts(_) > 0L).map { pid =>
      InternalRow(pid.toLong, firstPos(pid).toLong, counts(pid))
    }.toArray[Any]
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiPatternHits = copy(child = newChild)
}
