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
}
