package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram repetition sufficient statistics — the whole
  * Gopher repetition aggregation, doc-locally, in ONE byte pass: for
  * each requested n, `(n, topchars, dupchars)` where, over the
  * document's word n-grams grouped by their portable md5-52 hash
  * (the [[WordGramMd5]] recipe, same gram-byte-slice equivalence),
  *
  *   - `topchars` = `c · glen` of the argmax gram by
  *     `(count desc, h asc)` — the most-repeated n-gram's char
  *     coverage, and
  *   - `dupchars` = Σ `c · glen` over grams with `c ≥ 2` — chars
  *     inside ANY duplicated n-gram (occurrence×length convention),
  *
  * with `glen` = `max(code-point length)` under a (vanishingly rare)
  * 52-bit within-(doc, n) collision — every rule bit-identical to the
  * relational `groupBy(doc, n, h).agg(count, max(glen))` →
  * `min(struct(-c, h, glen))` chain this collapses
  * ([[graft.operators.CorpusOps.ngramRepetition]], which the DuckDB
  * oracle replays; a spec pins equality against that exact chain).
  *
  * WHY an in-expression aggregation when the relational form exists:
  * the aggregation key is `(doc, n, h)` — it NEVER crosses documents,
  * so a full-corpus explode + hash-agg exchange (~100M occurrence
  * rows at sf1, the whole corpus's gram stream at 100 TB) buys
  * nothing: every group is complete inside the document row we
  * already hold. Folding it here turns `q_repetition_ngrams` into
  * scan → project → project: ZERO exchanges at any scale, and the
  * per-task working set is one document's distinct-gram map — the
  * same map a Tungsten partial agg would build for that document's
  * colocated rows, minus the shuffle that followed it. (Bound: a
  * document with G distinct grams per n holds a ~4·G-slot long map —
  * presume pathological multi-GB docs are pre-chunked, e.g. via
  * `CorpusOps.chunkDocuments`, as every doc-wise operator here does.)
  *
  * (CodegenFallback: single virtual call per row, loop is compiled
  * Scala — the [[GramHashes]]/[[WordGramMd5]] precedent.)
  */
case class WordGramRepStats(child: Expression, ns: Seq[Int])
    extends UnaryExpression with CodegenFallback {

  require(ns.nonEmpty, "need at least one gram size")
  require(ns.forall(_ >= 1), s"gram sizes must be >= 1, got $ns")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("topchars", LongType, nullable = false),
    StructField("dupchars", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "word_gram_rep_stats"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val nBytes = bytes.length
    var delims = 0
    var b = 0
    while (b < nBytes) {
      if (bytes(b) == 0x20) delims += 1
      b += 1
    }
    val numWords = delims + 1
    // fail LOUD on pathological docs rather than wrapping the map-size
    // arithmetic below (Int overflow at ~2^29 words would leave an
    // 8-slot full table whose insert probe spins forever — a silent
    // task hang); the doc-wise contract is pre-chunking oversized docs
    require(numWords < (1 << 29),
      s"document has $numWords words (>= 2^29); pre-chunk it via " +
        "CorpusOps.chunkDocuments before doc-local repetition stats")
    val starts = new Array[Int](numWords + 1)
    var w = 1
    b = 0
    while (b < nBytes) {
      if (bytes(b) == 0x20) { starts(w) = b + 1; w += 1 }
      b += 1
    }
    starts(numWords) = nBytes + 1
    val digest = WordGramMd5.localMd5.get()
    val out = new Array[Any](ns.length)
    var ni = 0
    while (ni < ns.length) {
      val n = ns(ni)
      var topchars = 0L
      var dupchars = 0L
      if (numWords >= n) {
        val grams = numWords - n + 1
        // open-addressing long→(c:32|glen:32) map; glen stores the MAX
        // code-point length under h-collision (mirrors max(glen))
        var cap = 8
        // Long-math sizing: belt-and-braces under the require above
        // (grams * 2 can never wrap Int once numWords < 2^29)
        while (cap.toLong < grams.toLong * 2) cap <<= 1
        val keys = new Array[Long](cap)   // h + 1 (0 = empty slot)
        val vals = new Array[Long](cap)
        val mask = cap - 1
        var i = 0
        while (i < grams) {
          val from = starts(i)
          val until = starts(i + n) - 1
          digest.reset()
          digest.update(bytes, from, until - from)
          val d = digest.digest()
          val h = ((d(9) & 0x0FL) << 48) |
            ((d(10) & 0xFFL) << 40) | ((d(11) & 0xFFL) << 32) |
            ((d(12) & 0xFFL) << 24) | ((d(13) & 0xFFL) << 16) |
            ((d(14) & 0xFFL) << 8) | (d(15) & 0xFFL)
          var glen = 0L
          var p = from
          while (p < until) {
            if ((bytes(p) & 0xC0) != 0x80) glen += 1
            p += 1
          }
          var slot = (scala.util.hashing.byteswap64(h) & mask).toInt
          while (keys(slot) != 0L && keys(slot) != h + 1) {
            slot = (slot + 1) & mask
          }
          if (keys(slot) == 0L) {
            keys(slot) = h + 1
            vals(slot) = (1L << 32) | glen
          } else {
            val v = vals(slot)
            val mg = math.max(v & 0xFFFFFFFFL, glen)
            vals(slot) = (((v >>> 32) + 1L) << 32) | mg
          }
          i += 1
        }
        // fold: argmax by (c desc, h asc) and the c>=2 char sum
        var bestC = 0L
        var bestH = Long.MaxValue
        var bestGlen = 0L
        var slot = 0
        while (slot < cap) {
          if (keys(slot) != 0L) {
            val h = keys(slot) - 1
            val c = vals(slot) >>> 32
            val glen = vals(slot) & 0xFFFFFFFFL
            if (c > bestC || (c == bestC && h < bestH)) {
              bestC = c; bestH = h; bestGlen = glen
            }
            if (c >= 2) dupchars += c * glen
          }
          slot += 1
        }
        topchars = bestC * bestGlen
      }
      out(ni) = new GenericInternalRow(
        Array[Any](n, topchars, dupchars)): InternalRow
      ni += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordGramRepStats = copy(child = newChild)
}
