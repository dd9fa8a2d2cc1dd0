package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GramHashesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gramHashCol(text: org.apache.spark.sql.Column, n: Int) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      GramHashes(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), n))

  test("bitwise parity with xxhash64(substring) — ascii and multibyte") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaa",
      "naïve café — süß 日本語のテキスト mixed in",
      "𝕊urrogate 𝄞 pairs αβγδε and emoji 🙂🙃 tail",
      "ab",
      "")
    for (n <- Seq(1, 2, 3, 5, 25)) {
      val df = texts.toDF("t")
        .withColumn("fast", gramHashCol(col("t"), n))
        .withColumn("ref", expr(
          s"""CASE WHEN length(t) >= $n THEN
             |  transform(sequence(1, length(t) - ${n - 1}),
             |    i -> xxhash64(substring(t, i, $n)))
             |ELSE array() END""".stripMargin))
      val bad = df.filter(col("fast") =!= col("ref")).count()
      assert(bad == 0, s"n=$n mismatch:\n" +
        df.filter(col("fast") =!= col("ref")).select("t").collect().mkString)
    }
  }

  test("shorter-than-L and null inputs") {
    val df = Seq(Some("abc"), None).toDF("t")
      .select(gramHashCol(col("t"), 5).as("h"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).isNullAt(0))
  }

  test("element i is the hash of the gram starting at char i+1") {
    val got = Seq("abcd").toDF("t")
      .select(gramHashCol(col("t"), 2).as("h"))
      .collect().head.getSeq[Long](0)
    val want = Seq("ab", "bc", "cd").toDF("g")
      .select(xxhash64(col("g"))).as[Long].collect().toSeq
    assert(got == want)
  }

  test("GramHashPairs: h is bitwise GramHashes; h2 differs per gram and " +
      "distinguishes distinct grams (the shrapnel discriminator)") {
    def pairsCol(text: org.apache.spark.sql.Column, n: Int) =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        GramHashPairs(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
          n, 0x5EEDC0DEL))
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "naïve café — süß 日本語のテキスト mixed in",
      "abab", "ab", "")
    for (n <- Seq(1, 3, 5)) {
      val rows = texts.toDF("t")
        .withColumn("pair", pairsCol(col("t"), n))
        .withColumn("fast", gramHashCol(col("t"), n))
        .select(expr("transform(pair, x -> x.h)").as("h"),
          expr("transform(pair, x -> x.h2)").as("h2"), col("fast"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](2),
          s"n=$n: h must equal the single-seed kernel")
        val h = r.getSeq[Long](0); val h2 = r.getSeq[Long](1)
        // equal grams agree on both hashes; distinct grams differ on h2
        h.indices.foreach { i =>
          h.indices.foreach { j =>
            if (h(i) == h(j)) assert(h2(i) == h2(j),
              "equal grams must share h2 (it is a pure gram function)")
          }
        }
      }
    }
    // repeated gram in "abab": positions 0 and 2 of the 2-grams agree
    // on (h, h2); the interleaved "ba" differs on both
    val ab = Seq("abab").toDF("t")
      .select(pairsCol(col("t"), 2).as("p"))
      .select(expr("transform(p, x -> x.h)").as("h"),
        expr("transform(p, x -> x.h2)").as("h2"))
      .collect().head
    val (h, h2) = (ab.getSeq[Long](0), ab.getSeq[Long](1))
    assert(h(0) == h(2) && h2(0) == h2(2))
    assert(h(0) != h(1) && h2(0) != h2(1))
  }
}
