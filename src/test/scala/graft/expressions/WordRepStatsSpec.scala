package graft.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WordRepStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kernelCol(text: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WordRepStats(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** The relational chain the kernel collapses (repetitionStats'
    * pre-r13 shape): string-exact word distinct + bigram groupBy. */
  private def relational(df: DataFrame): DataFrame = {
    val words = split(col("t"), " ")
    val base = df.select(col("id").as("__doc"),
      size(words).cast("long").as("n_words"),
      size(array_distinct(words)).cast("long").as("n_distinct_words"),
      words.as("__w"))
    val idxs = when(size(col("__w")) >= 2,
      sequence(lit(1), size(col("__w")) - 1))
      .otherwise(array().cast("array<int>"))
    val perDoc = base.select(col("__doc"),
      explode(transform(idxs,
        i => concat_ws(" ", element_at(col("__w"), i),
          element_at(col("__w"), i + 1)))).as("bg"))
      .groupBy(col("__doc"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("__doc"))
      .agg(max(col("c")).as("top_bigram"), sum(col("c")).as("n_bigrams"))
    base.drop("__w").join(perDoc, Seq("__doc"), "left")
      .select(col("__doc"), col("n_words"), col("n_distinct_words"),
        coalesce(col("top_bigram"), lit(0L)).as("top_bigram"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }

  private def viaKernel(df: DataFrame): DataFrame =
    df.select(col("id").as("__doc"), kernelCol(col("t")).as("__r"))
      .select(col("__doc"), col("__r.n_words").as("n_words"),
        col("__r.n_distinct_words").as("n_distinct_words"),
        col("__r.top_bigram").as("top_bigram"),
        col("__r.n_bigrams").as("n_bigrams"))

  test("kernel == relational string-exact chain on fixture docs") {
    val docs = Seq(
      (1L, "a b a b a b a"),
      (2L, "one two three two one"),
      (3L, "solo"),
      (4L, ""),
      (5L, "x  y  x  y"),            // empty words group exactly too
      (6L, "naïve café naïve café 日本 語 日本"),
      (7L, "t t t t t t"),
      (8L, "trailing space "),
      (9L, "𝄞 clef 𝄞 clef 🙂 🙂 🙂")).toDF("id", "t")
    val a = viaKernel(docs).orderBy("__doc").collect().toSeq
    val b = relational(docs).orderBy("__doc").collect().toSeq
    assert(a == b, s"\nkernel:     $a\nrelational: $b")
  }

  test("kernel == relational on 300 seeded random docs (tiny vocab " +
    "forces heavy duplication; includes 32-bit-hash-bucket stress)") {
    val rnd = new scala.util.Random(77L)
    val vocab = Vector("a", "b", "ab", "ba", "γ", "", "xx")
    val docs = (0 until 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(80))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("id", "t")
    val a = viaKernel(docs).orderBy("__doc").collect().toSeq
    val b = relational(docs).orderBy("__doc").collect().toSeq
    assert(a == b)
  }

  test("null text propagates null; values are exact on a known doc") {
    val rows = Seq((1L, Some("w1 w2 w1 w2 w1")), (2L, None)).toDF("id", "t")
      .select(col("id"), kernelCol(col("t")).as("r")).orderBy("id").collect()
    // words: w1,w2,w1,w2,w1 -> 5 words, 2 distinct; bigrams:
    // "w1 w2"x2, "w2 w1"x2 -> top 2 of 4
    assert(rows(0).getStruct(1).toSeq == Seq(5L, 2L, 2L, 4L))
    assert(rows(1).isNullAt(1))
  }
}
