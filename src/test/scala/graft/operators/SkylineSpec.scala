package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Skyline vs brute force on seeded random points; exact ties survive
  * together; local-prune distributivity holds across repartitionings.
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filterNot { case (_, x1, y1) =>
      pts.exists { case (_, x2, y2) =>
        x2 <= x1 && y2 >= y1 && (x2 < x1 || y2 > y1)
      }
    }.map(_._1).toSet

  test("matches brute force on 500 seeded random points (min x, max y)") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 500L).map(i =>
      (i, rnd.nextInt(1000).toDouble, rnd.nextInt(1000).toDouble))
    val out = Skyline.skyline(pts.toDF("id", "x", "y"), "id",
      minCols = Seq("x"), maxCols = Seq("y"))
      .collect().map(_.getLong(0)).toSet
    assert(out == brute(pts))
  }

  test("all-objective ties survive together; result partition-invariant") {
    val pts = Seq((1L, 1.0, 9.0), (2L, 1.0, 9.0), (3L, 2.0, 9.0),
      (4L, 0.5, 1.0), (5L, 3.0, 10.0))
    for (n <- Seq(1, 3, 8)) {
      val out = Skyline.skyline(pts.toDF("id", "x", "y").repartition(n),
        "id", Seq("x"), Seq("y")).collect().map(_.getLong(0)).toSet
      // 1 and 2 tie (neither dominates); 3 dominated by 1/2; 4 survives
      // (cheapest); 5 survives (highest y)
      assert(out == Set(1L, 2L, 4L, 5L), s"partitions=$n")
    }
  }

  test("rows with null objectives are excluded") {
    val pts = Seq((1L, Option(1.0), Option(5.0)),
      (2L, Option.empty[Double], Option(9.0)))
      .toDF("id", "x", "y")
    val out = Skyline.skyline(pts, "id", Seq("x"), Seq("y"))
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }
}
