package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("query_id", "neighbor_id", "rank")

  private def eval(truth: Seq[(Long, Long, Int)],
      run: Seq[(Long, Long, Int)], k: Int) =
    Retrieval.evalTopK(df(truth), df(run), k)
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("recall, MRR, and nDCG on a partially-correct run") {
    val got = eval(
      truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)),
      run = Seq((1L, 11L, 1), (1L, 99L, 2), (1L, 10L, 3)),
      k = 3)(1L)
    assert((got._2, got._3, got._4) == (3L, 3L, 2L))
    assert(got._5 == 2.0 / 3.0) // recall, exact division
    assert(got._6 == 1.0) // first run row is relevant
    // dcg = 1/log2(2) + 1/log2(4) = 1.5; idcg = 1.5 + 1/log2(3)
    val idcg = 1.5 + 1.0 / (math.log(3.0) / math.log(2.0))
    assert(math.abs(got._7 - 1.5 / idcg) < 1e-12)
  }

  test("zero hits scores all-zero metrics; missing query scores zeros") {
    val got = eval(
      truth = Seq((2L, 20L, 1), (2L, 21L, 2), (3L, 5L, 1)),
      run = Seq((2L, 30L, 1), (2L, 31L, 2)),
      k = 3)
    assert(got(2L) == ((2L, 2L, 2L, 0L, 0.0, 0.0, 0.0)))
    assert(got(3L) == ((3L, 1L, 0L, 0L, 0.0, 0.0, 0.0)))
  }

  test("rows beyond rank k are ignored on both sides") {
    // the rank-4 truth row and the rank-4 run row (which WOULD be a
    // hit) must both be invisible at k = 3
    val got = eval(
      truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4)),
      run = Seq((1L, 10L, 1), (1L, 98L, 2), (1L, 99L, 3), (1L, 13L, 4)),
      k = 3)(1L)
    assert((got._2, got._3, got._4) == (3L, 3L, 1L))
    assert(got._5 == 1.0 / 3.0)
  }

  test("perfect run scores 1.0 across the board") {
    val rows = Seq((4L, 40L, 1), (4L, 41L, 2), (4L, 42L, 3))
    val got = eval(rows, rows, k = 3)(4L)
    assert((got._4, got._5, got._6) == (3L, 1.0, 1.0))
    assert(math.abs(got._7 - 1.0) < 1e-15)
  }

  private def rbo(a: Seq[(Long, Long, Int)], b: Seq[(Long, Long, Int)],
      k: Int) =
    Retrieval.rankBiasedOverlap(df(a), df(b), k)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("rbo: identical lists reach the truncated maximum") {
    val rows = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val got = rbo(rows, rows, k = 3)(1L)
    val exp = 0.1 * (1.0 + math.pow(0.9, 1) + math.pow(0.9, 2))
    assert(got._1 == 3L)
    assert(math.abs(got._2 - exp) < 1e-12)
  }

  test("rbo: top agreement outweighs tail agreement") {
    // both share the top item; X = [1, 1, 2] vs tail-only X = [0, 1, 2]
    val base = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val topMatch = rbo(base,
      Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 12L, 3)), k = 3)(1L)
    val tailMatch = rbo(base,
      Seq((1L, 99L, 1), (1L, 10L, 2), (1L, 12L, 3)), k = 3)(1L)
    assert(topMatch._1 == 2L && tailMatch._1 == 2L)
    assert(topMatch._2 > tailMatch._2)
  }

  test("rbo: disjoint lists score zero") {
    val got = rbo(
      Seq((2L, 1L, 1), (2L, 2L, 2)),
      Seq((2L, 8L, 1), (2L, 9L, 2)), k = 2)(2L)
    assert(got == ((0L, 0.0)))
  }
}
