package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ContrastiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"g${i % 5}")).toDF("id", "grp")

  test("draws are out-of-group, non-self, and at most k per anchor") {
    val r = Contrastive.negativePairs(corpus(200), "id", "grp", k = 4)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(0) != row.getLong(2)) // not self
    }
    val joined = Contrastive.negativePairs(corpus(200), "id", "grp", k = 4)
      .join(corpus(200).select(col("id").as("anchor_id"),
        col("grp").as("anchor_grp")), Seq("anchor_id"))
      .filter(col("neg_group") === col("anchor_grp"))
    assert(joined.count() == 0)
    val perAnchor = Contrastive.negativePairs(corpus(200), "id", "grp", k = 4)
      .groupBy("anchor_id").count().agg(max("count")).as[Long].head()
    assert(perAnchor <= 4)
  }

  test("deterministic and partitioning-invariant") {
    val a = Contrastive.negativePairs(corpus(300), "id", "grp", k = 3)
      .orderBy("anchor_id", "j").collect().toSeq
    val b = Contrastive.negativePairs(corpus(300).repartition(13),
        "id", "grp", k = 3)
      .orderBy("anchor_id", "j").collect().toSeq
    assert(a == b)
  }

  test("j indexes are within [1, k] and draws vary with j") {
    val r = Contrastive.negativePairs(corpus(500), "id", "grp", k = 6)
    val js = r.select("j").distinct().as[Long].collect().toSet
    assert(js.subsetOf((1L to 6L).toSet))
    // different j should usually fetch different negatives for an anchor
    val varied = r.groupBy("anchor_id")
      .agg(countDistinct("neg_id").as("d"), count(lit(1)).as("n"))
      .filter(col("d") > 1).count()
    assert(varied > 400)
  }

  test("single-group corpus yields no pairs") {
    val one = (0 until 50).map(i => (i.toLong, "only")).toDF("id", "grp")
    assert(Contrastive.negativePairs(one, "id", "grp", k = 2).count() == 0)
  }
}
