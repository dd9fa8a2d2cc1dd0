package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

class WordShinglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native shingles equal the HOF spec formulation on the corpus " +
    "and on edge cases") {
    val edge = Seq("", " ", "a", "a b", "a b c", "a b c d",
      "a  b c", " leading", "trailing ", "x y x y x y")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).as[String].collect().toSeq ++ edge
    val df = docs.toDF("text")
    for (n <- Seq(1, 2, 3, 5)) {
      val diffs = df
        .withColumn("native", TextFunctions.wordShingles(col("text"), n))
        .withColumn("hof", TextFunctions.wordShinglesHof(col("text"), n))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(diffs == 0, s"n=$n mismatch")
    }
  }
}
