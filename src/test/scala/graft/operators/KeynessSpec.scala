package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** χ²-keyness contracts: the statistic against a hand-computed 2×2
  * table, direction gating, the minCount floor, and tokenization edges.
  */
class KeynessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chi2 matches the hand-computed 2x2 table") {
    // group X: "cat cat cat dog"; group Y: "dog dog dog dog cat"
    // token=cat: a=3, b=1, c=1, d=4  (N=9)
    //   chi2 = 9·(3·4 − 1·1)² / (4·5·4·5) = 9·121/400 = 2.7225
    val df = Seq(("x", "cat cat cat dog"), ("y", "dog dog dog dog cat"))
      .toDF("grp", "text")
    val out = Keyness.chiSquareKeyness(df, "grp", "text",
      minCount = 1L, topN = 10)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[String]("token"),
        r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"),
        r.getAs[Long]("d"), r.getAs[Double]("chi2")))
    val cat = out.find(t => t._1 == "x" && t._2 == "cat").get
    assert((cat._3, cat._4, cat._5, cat._6) == (3L, 1L, 1L, 4L))
    assert(math.abs(cat._7 - 2.7225) < 1e-12)
    // dog is over-represented in y with the mirrored table
    val dog = out.find(t => t._1 == "y" && t._2 == "dog").get
    assert((dog._3, dog._4, dog._5, dog._6) == (4L, 1L, 1L, 3L))
  }

  test("under-represented tokens are excluded (direction gate)") {
    val df = Seq(("x", "cat cat cat dog"), ("y", "dog dog dog dog cat"))
      .toDF("grp", "text")
    val out = Keyness.chiSquareKeyness(df, "grp", "text", 1L, 10)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[String]("token")))
      .toSet
    // dog is UNDER-represented in x (1/4 vs 4/5 elsewhere) — no row
    assert(!out.contains(("x", "dog")) && !out.contains(("y", "cat")))
  }

  test("minCount floors the in-group count") {
    val df = Seq(("x", "rare common common"), ("y", "common common common"))
      .toDF("grp", "text")
    val out = Keyness.chiSquareKeyness(df, "grp", "text",
      minCount = 2L, topN = 10)
      .collect().map(r => r.getAs[String]("token")).toSet
    assert(!out.contains("rare"))
  }

  test("tokenization: case-folded, non-letters split, empty/null safe") {
    val df = Seq(("x", "Cat, CAT! cat?"), ("y", "dog 123 dog"),
      ("z", null.asInstanceOf[String]), ("w", ""))
      .toDF("grp", "text")
    val out = Keyness.chiSquareKeyness(df, "grp", "text", 1L, 10)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[String]("token"),
        r.getAs[Long]("a")))
    assert(out.exists(t => t._1 == "x" && t._2 == "cat" && t._3 == 3L))
    assert(out.forall(t => t._2.nonEmpty && t._2.forall(_.isLower)))
  }

  test("rank is dense per group, capped at topN, chi2-descending") {
    val docs = (1 to 30).map(i => ("x", s"tok$i " * i)) ++
      (1 to 30).map(i => ("y", s"other$i " * i))
    val out = Keyness.chiSquareKeyness(docs.toDF("grp", "text"), "grp",
      "text", minCount = 1L, topN = 5)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("rank"),
        r.getAs[Double]("chi2")))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      assert(sorted.length <= 5)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq)
    }
  }
}
