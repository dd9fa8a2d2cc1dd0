package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFunctions

class FloatDotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codegen'd dot product is bitwise identical to the HOF spec " +
    "formulation on every corpus pair") {
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b).filter($"ia" < $"ib").limit(2000)
    val diffs = pairs
      .withColumn("native", VectorFunctions.dot(col("ea"), col("eb")))
      .withColumn("hof", VectorFunctions.dotHof(col("ea"), col("eb")))
      .filter($"native" =!= $"hof")
      .count()
    assert(diffs == 0)
  }

  test("native hyperplane key is bitwise identical to the HOF spec " +
    "formulation across planes and seeds") {
    for (nPlanes <- Seq(4, 6, 8); seed <- Seq(0, 3)) {
      val diffs = emb
        .withColumn("native",
          VectorFunctions.randomHyperplaneKey(col("embedding"), nPlanes, seed))
        .withColumn("hof",
          VectorFunctions.randomHyperplaneKeyHof(col("embedding"), nPlanes, seed))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(diffs == 0, s"nPlanes=$nPlanes seed=$seed mismatch")
    }
  }

  test("null input yields null; empty arrays dot to 0.0") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b")).as("d"))
      .collect()
    assert(df(0).getDouble(0) == 11.0)
    assert(df(1).isNullAt(0))
    assert(df(2).getDouble(0) == 0.0)
  }
}
