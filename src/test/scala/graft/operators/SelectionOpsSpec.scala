package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** greedyCoverage hand-traced picks and regressionByGroup on exact lines. */
class SelectionOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("greedyCoverage picks by marginal gain with min-id ties, " +
    "stops when nothing new remains") {
    val docs = Seq(
      (1L, "a b c d e"),  // shingles: abc bcd cde (3)
      (2L, "a b c x y"),  // abc bcx cxy (3, 2 new after doc 1)
      (3L, "p q r s"),    // pqr qrs (2)
      (4L, "a b c d e")   // duplicate of doc 1 — never adds anything
    ).toDF("doc_id", "text")
    val out = CorpusOps.greedyCoverage(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // round 1: docs 1 and 2 tie at 3 -> min id 1; round 2: doc 2 adds 2,
    // doc 3 adds 2 -> min id 2; round 3: doc 3 adds 2; round 4: doc 4
    // adds 0 -> selection stops at 3 picks.
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 3L), (2L, 2L, 2L, 5L), (3L, 3L, 2L, 7L)))
  }

  test("regressionByGroup recovers an exact line per group") {
    val pts = (for {
      g <- Seq("g1", "g2"); x <- 0L to 10L
    } yield (g, x, if (g == "g1") 2 * x + 1 else 7 - x)).toDF("g", "x", "y")
    val out = CorpusOps.regressionByGroup(pts, "g", "x", "y")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Double]("slope"),
        r.getAs[Double]("intercept")))
    assert(out.toSeq == Seq(("g1", 2.0, 1.0), ("g2", -1.0, 7.0)))
  }
}
