package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Long)] = {
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = ed(sa, sb) if dist <= k
    } yield (ia, ib, dist.toLong)).toSet
  }

  private def run(rows: Seq[(Long, String)], q: Int, k: Int) =
    FuzzyJoin.fuzzySelfJoin(rows.toDF("id", "s"), "id", "s", q, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("finds exactly the true pair set on planted typos") {
    val rows = Seq[(Long, String)](
      (1L, "johnson controls"), (2L, "jonson controls"), // deletion
      (3L, "johnson kontrols"), // substitution vs 1
      (4L, "johnson controls inc"), // too far from all (3 inserts)
      (5L, "acme widgets"), (6L, "acme wdgets"), // deletion
      (7L, "zzz unrelated"))
    val got = run(rows, q = 2, k = 1)
    assert(got == bruteForce(rows, 1))
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)))
    assert(!got.exists { case (a, b, _) => a == 4L || b == 4L })
  }

  test("completeness against brute force on a digit-grid corpus") {
    // structured near-dups: zero-padded numbers, rich ed=1 structure
    val rows = (0L until 300L).map(i => (i, f"item-$i%05d"))
    val got = run(rows, q = 2, k = 1)
    assert(got == bruteForce(rows, 1))
    assert(got.nonEmpty)
  }

  test("k=2 with random edits stays complete") {
    val base = "the quick brown fox jumps"
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map { i =>
      val chars = base.toCharArray
      val edits = rnd.nextInt(3)
      (0 until edits).foreach { _ =>
        chars(rnd.nextInt(chars.length)) = ('a' + rnd.nextInt(26)).toChar
      }
      (i, new String(chars))
    }
    assert(run(rows, q = 2, k = 2) == bruteForce(rows, 2))
  }

  test("short strings below q are skipped, not crashed") {
    val rows = Seq[(Long, String)]((1L, "a"), (2L, "ab"), (3L, "ab"))
    val got = run(rows, q = 2, k = 1)
    assert(got == Set((2L, 3L, 0L))) // the q-length pair still matches
  }

  private def bruteJaccard(rows: Seq[(Long, String)],
      tauPpm: Long): Set[(Long, Long, Long)] = {
    def shingles(s: String): Set[String] =
      s.split(" ").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val sh = rows.map { case (i, s) => i -> shingles(s) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      common = (sa & sb).size.toLong
      union = (sa | sb).size.toLong
      if common * 1000000L >= tauPpm * union
    } yield (ia, ib, common)).toSet
  }

  private def runSim(rows: Seq[(Long, String)], tauPpm: Long) =
    FuzzyJoin.setSimilarityJoin(rows.toDF("id", "s"), "id", "s",
      3, tauPpm).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet

  test("set-similarity join matches brute force across thresholds") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val words = base.split(" ")
    val rnd = new scala.util.Random(3)
    val rows = (0L until 40L).map { i =>
      val w = words.clone()
      (0 until rnd.nextInt(4)).foreach { _ =>
        w(rnd.nextInt(w.length)) = s"sub${rnd.nextInt(6)}"
      }
      (i, w.mkString(" "))
    }
    for (tau <- Seq(300000L, 500000L, 800000L)) {
      assert(runSim(rows, tau) == bruteJaccard(rows, tau), s"tau=$tau")
    }
    assert(runSim(rows, 300000L).nonEmpty)
  }

  test("set-similarity boundary: jaccard exactly tau is included") {
    // a: 2 shingles {A,B}; b: 4 shingles {A,B,C,D} → J = 1/2 exactly
    val rows = Seq[(Long, String)](
      (1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w4 x y"))
    assert(runSim(rows, 500000L) == Set((1L, 2L, 2L)))
    assert(runSim(rows, 500001L).isEmpty)
  }

  test("contract bounds are enforced") {
    val df = Seq((1L, "abc")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzySelfJoin(df, "id", "s", q = 0)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzySelfJoin(df, "id", "s", maxDist = 0)
    }
  }
}
