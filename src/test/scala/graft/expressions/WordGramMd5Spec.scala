package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WordGramMd5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kernelCol(text: org.apache.spark.sql.Column, ns: Seq[Int]) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WordGramMd5(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), ns))

  /** The composed-function form the kernel replaces (ngramRepetition's
    * pre-r13 occ projection), element-for-element. */
  private def referenceCol(ns: Seq[Int]) = {
    val per = ns.map { n =>
      expr(
        s"""transform(
           |  CASE WHEN size(split(t, ' ')) >= $n
           |    THEN sequence(1, size(split(t, ' ')) - ${n - 1})
           |    ELSE CAST(array() AS array<int>) END,
           |  i -> named_struct(
           |    'n', $n,
           |    'h', CAST(conv(substring(md5(to_binary(
           |      concat_ws(' ', slice(split(t, ' '), i, $n)),
           |      'utf-8')), 20, 13), 16, 10) AS BIGINT),
           |    'glen', CAST(length(
           |      concat_ws(' ', slice(split(t, ' '), i, $n))) AS BIGINT)))"""
          .stripMargin)
    }
    flatten(array(per: _*))
  }

  private val trickyTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "single",
    "double  space   and triple", // empty words must round-trip
    "trailing space ",            // split keeps the trailing empty word
    " leading",
    "naïve café — süß 日本語 の テキスト mixed",
    "𝕊urrogate 𝄞 pairs αβγδε emoji 🙂🙃 tail words here",
    "a b",
    "")

  test("bitwise parity with the composed slice/concat_ws/md5/conv form " +
    "— ascii, multibyte, astral, consecutive/trailing spaces") {
    for (ns <- Seq(Seq(1), Seq(2), Seq(2, 3, 4, 5, 10), Seq(10, 2))) {
      val df = trickyTexts.toDF("t")
        .withColumn("fast", kernelCol(col("t"), ns))
        .withColumn("ref", referenceCol(ns))
      val bad = df.filter(col("fast") =!= col("ref"))
      assert(bad.count() == 0, s"ns=$ns mismatch on:\n" +
        bad.select("t", "fast", "ref").collect().mkString("\n"))
    }
  }

  test("parity property: 200 seeded random word streams (sizes 0-40, " +
    "multibyte alphabet, random double spaces)") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("alpha", "beta", "γάμμα", "δ", "🙂", "naïve",
      "x", "longishtokenword", "日本", "")
    val texts = (0 until 200).map { _ =>
      val k = rnd.nextInt(41)
      Seq.fill(k)(vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    }
    val ns = Seq(2, 3, 5)
    val df = texts.toDF("t")
      .withColumn("fast", kernelCol(col("t"), ns))
      .withColumn("ref", referenceCol(ns))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("null input stays null; short docs emit only the n's that fit") {
    val rows = Seq(Some("a b"), None).toDF("t")
      .select(kernelCol(col("t"), Seq(2, 3)).as("g")).collect()
    assert(rows(0).getSeq[Any](0).size == 1) // one 2-gram, no 3-gram
    assert(rows(1).isNullAt(0))
  }

  test("hash value matches the DuckDB oracle recipe on a known gram") {
    // oracle side: ('0x' || substr(md5('a b'), 20, 13))::BIGINT —
    // replayed here via the same Spark composed form
    val got = Seq("a b").toDF("t")
      .select(explode(kernelCol(col("t"), Seq(2))).as("g"))
      .select(col("g.h")).as[Long].collect().head
    val want = Seq("a b").toDF("g")
      .select(expr(
        "CAST(conv(substring(md5(to_binary(g, 'utf-8')), 20, 13), 16, 10)" +
          " AS BIGINT)")).as[Long].collect().head
    assert(got == want)
  }

  // the registered SQL face is covered in GraftExtensionsSpec (needs a
  // session built withExtensions; TestSpark's shared session isn't)
}
