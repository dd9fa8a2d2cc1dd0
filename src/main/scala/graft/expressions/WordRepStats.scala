package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word/bigram repetition sufficient statistics, doc-
  * locally, in one pass: `(n_words, n_distinct_words, top_bigram,
  * n_bigrams)` where words are Spark `split(text, " ")` elements
  * (empty words from consecutive/trailing spaces count, `numWords =
  * delimiters + 1`), `n_distinct_words` groups words by EXACT bytes,
  * and `top_bigram` is the max occurrence count over exact-byte
  * bigrams (`word_i ++ " " ++ word_{i+1}` — a byte SLICE of the
  * original text, so nothing is ever assembled).
  *
  * This collapses [[graft.operators.CorpusOps.repetitionStats]]'
  * relational chain (bigram explode → `groupBy(doc, bigram-string)` →
  * `groupBy(doc)` → join), whose aggregation keys never cross
  * documents — the full-corpus bigram-string exchange bought nothing.
  * Unlike the hash-keyed [[WordGramRepStats]] (whose md5-52 grouping
  * the oracle REPLAYS), this operator's DuckDB oracle groups by the
  * bigram STRING, so the kernel grouping must be string-exact:
  * grouping is decided by exact byte comparison — a 32-bit xxhash
  * only pre-buckets via one primitive `Arrays.sort` of packed
  * `(hash32 | index)` longs, and equal-hash runs resolve by
  * `Arrays.equals` over the byte ranges. No collision caveat exists
  * at any probability; a spec pins equality against the relational
  * form on seeded random corpora.
  *
  * (CodegenFallback: single virtual call per row — the
  * [[GramHashes]]/[[WordGramMd5]] precedent.)
  */
case class WordRepStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))

  override def prettyName: String = "word_rep_stats"

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
    val starts = new Array[Int](numWords + 1)
    var w = 1
    b = 0
    while (b < nBytes) {
      if (bytes(b) == 0x20) { starts(w) = b + 1; w += 1 }
      b += 1
    }
    starts(numWords) = nBytes + 1

    // group spans [starts(i), starts(i+span)-1) by exact bytes:
    // primitive sort on (xxhash32 << 32 | i), exact compare within
    // equal-hash runs; returns (distinct groups, max group size)
    def spanGroupStats(count: Int, span: Int): (Long, Long) = {
      if (count <= 0) return (0L, 0L)
      val keys = new Array[Long](count)
      var i = 0
      while (i < count) {
        val from = starts(i)
        val until = starts(i + span) - 1
        val h32 = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
          until - from, 42L) >>> 32
        keys(i) = (h32 << 32) | i.toLong
        i += 1
      }
      java.util.Arrays.sort(keys)
      var distinct = 0L
      var maxRun = 0L
      // per equal-hash run: tiny exact grouping by representative scan
      val repIdx = new java.util.ArrayList[Int]()
      val repCnt = new java.util.ArrayList[Long]()
      var r = 0
      while (r < count) {
        val h = keys(r) >>> 32
        var e = r
        repIdx.clear(); repCnt.clear()
        while (e < count && (keys(e) >>> 32) == h) {
          val idx = (keys(e) & 0xFFFFFFFFL).toInt
          val f = starts(idx)
          val u = starts(idx + span) - 1
          var g = 0
          var matched = false
          while (g < repIdx.size && !matched) {
            val ri = repIdx.get(g)
            val rf = starts(ri)
            val ru = starts(ri + span) - 1
            if (ru - rf == u - f &&
                java.util.Arrays.equals(bytes, f, u, bytes, rf, ru)) {
              repCnt.set(g, repCnt.get(g) + 1L)
              matched = true
            }
            g += 1
          }
          if (!matched) { repIdx.add(idx); repCnt.add(1L) }
          e += 1
        }
        distinct += repIdx.size
        var g = 0
        while (g < repCnt.size) {
          if (repCnt.get(g) > maxRun) maxRun = repCnt.get(g)
          g += 1
        }
        r = e
      }
      (distinct, maxRun)
    }

    val (nDistinctWords, _) = spanGroupStats(numWords, 1)
    val nBigrams = math.max(numWords - 1, 0)
    val (_, topBigram) = spanGroupStats(nBigrams, 2)
    new GenericInternalRow(Array[Any](
      numWords.toLong, nDistinctWords, topBigram, nBigrams.toLong))
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordRepStats = copy(child = newChild)
}
