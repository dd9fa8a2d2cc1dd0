package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows on a skewed key") {
    // 10k facts, 95% on one hot key
    val facts = spark.range(10000)
      .select(col("id"),
        when(col("id") % 20 =!= 0, lit("HOT")).otherwise(concat(lit("k"),
          col("id") % 7)).as("key"))
    val dim = Seq(("HOT", "hot dim"), ("k0", "d0"), ("k3", "d3"))
      .toDF("key", "payload")
    val plain = facts.join(dim, Seq("key"))
      .select("key", "id", "payload").as[(String, Long, String)]
      .collect().toSet
    val salted = Skew.saltedJoin(facts, dim, "key", saltSrc = col("id"),
      buckets = 8)
      .select("key", "id", "payload").as[(String, Long, String)]
      .collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "HOT") > 9000) // the skew is real
  }

  test("salt spreads the hot key across all buckets deterministically") {
    val facts = spark.range(1000).select(col("id"), lit("HOT").as("key"))
    val buckets = facts
      .select(Skew.saltCol(col("id"), 8).as("b"))
      .groupBy("b").count().collect().map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(buckets.keySet == (0 until 8).toSet)
    // roughly even: no bucket holds more than 2x its fair share
    assert(buckets.values.max <= 2 * 1000 / 8)
  }
}
