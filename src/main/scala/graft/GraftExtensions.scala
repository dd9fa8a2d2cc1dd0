package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DeflateRatio, FloatDotProduct, RandomHyperplaneKey, UnicodeNormalize, WordShingles}

/** `SparkSessionExtensions` hook: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get them without
  * touching the Scala API:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT float_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * Also loadable via `spark.sql.extensions=graft.GraftExtensions` on a
  * cluster — no code changes, the standard deployment seam.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "float_dot takes exactly 2 arguments")
        FloatDotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(text, n)")
        WordShingles(args(0), foldableInt(args(1), "word_shingles n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "deflate_ratio takes exactly 1 argument")
        DeflateRatio(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("deflate_stored_len"),
      new ExpressionInfo(classOf[graft.expressions.DeflateStoredLen].getName,
        "deflate_stored_len"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "deflate_stored_len takes exactly 1 argument")
        graft.expressions.DeflateStoredLen(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_norm"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "unicode_norm(text, 'NFC'|'NFD'|'NFKC'|'NFKD')")
        UnicodeNormalize(args(0), foldableString(args(1), "unicode_norm form"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_key"),
      new ExpressionInfo(classOf[RandomHyperplaneKey].getName, "hyperplane_key"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "hyperplane_key(vec, nPlanes, seed)")
        RandomHyperplaneKey(args(0),
          foldableInt(args(1), "hyperplane_key nPlanes"),
          foldableInt(args(2), "hyperplane_key seed"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[graft.expressions.GramHashes].getName,
        "gram_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "gram_hashes(text, len)")
        graft.expressions.GramHashes(args(0),
          foldableInt(args(1), "gram_hashes len"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_gram_md5"),
      new ExpressionInfo(classOf[graft.expressions.WordGramMd5].getName,
        "word_gram_md5"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "word_gram_md5(text, n1 [, n2, ...])")
        graft.expressions.WordGramMd5(args(0),
          args.tail.map(foldableInt(_, "word_gram_md5 n")))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_gram_rep_stats"),
      new ExpressionInfo(
        classOf[graft.expressions.WordGramRepStats].getName,
        "word_gram_rep_stats"),
      (args: Seq[Expression]) => {
        require(args.length >= 2,
          "word_gram_rep_stats(text, n1 [, n2, ...])")
        graft.expressions.WordGramRepStats(args(0),
          args.tail.map(foldableInt(_, "word_gram_rep_stats n")))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_rep_stats"),
      new ExpressionInfo(classOf[graft.expressions.WordRepStats].getName,
        "word_rep_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "word_rep_stats(text)")
        graft.expressions.WordRepStats(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("line_rep_stats"),
      new ExpressionInfo(classOf[graft.expressions.LineRepStats].getName,
        "line_rep_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "line_rep_stats(text)")
        graft.expressions.LineRepStats(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("multi_pattern_hits"),
      new ExpressionInfo(
        classOf[graft.expressions.MultiPatternHits].getName,
        "multi_pattern_hits"),
      (args: Seq[Expression]) => {
        require(args.length >= 2,
          "multi_pattern_hits(text, pattern1 [, pattern2, ...])")
        graft.expressions.MultiPatternHits(args(0),
          args.tail.map(foldableString(_, "multi_pattern_hits pattern")))
      }))
  }

  private def foldableString(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
  }

  private def foldableInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }
}
