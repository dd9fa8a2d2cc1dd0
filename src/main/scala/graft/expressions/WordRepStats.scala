package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
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

    // spans [starts(i), starts(i+span)-1), grouped by exact bytes via
    // the shared SpanGroups primitive
    def spanArrays(count: Int, span: Int): (Array[Int], Array[Int]) = {
      val from = new Array[Int](math.max(count, 0))
      val until = new Array[Int](math.max(count, 0))
      var i = 0
      while (i < count) {
        from(i) = starts(i)
        until(i) = starts(i + span) - 1
        i += 1
      }
      (from, until)
    }
    var nDistinctWords = 0L
    locally {
      val (f, u) = spanArrays(numWords, 1)
      SpanGroups.foreachGroup(bytes, f, u, numWords) { (_, _) =>
        nDistinctWords += 1
      }
    }
    val nBigrams = math.max(numWords - 1, 0)
    var topBigram = 0L
    locally {
      val (f, u) = spanArrays(nBigrams, 2)
      SpanGroups.foreachGroup(bytes, f, u, nBigrams) { (_, c) =>
        if (c > topBigram) topBigram = c
      }
    }
    new GenericInternalRow(Array[Any](
      numWords.toLong, nDistinctWords, topBigram, nBigrams.toLong))
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordRepStats = copy(child = newChild)
}
