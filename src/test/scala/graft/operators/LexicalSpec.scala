package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LexicalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lexicalStats: hand-computed entropy, TTR, and modal frequency") {
    val docs = Seq(
      (1L, "a b a"),            // a=2 b=1
      (2L, "x x x x"),          // degenerate: one type, entropy 0
      (3L, "p q r s"))          // uniform: entropy = ln 4
      .toDF("doc_id", "text")
    val out = Lexical.lexicalStats(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "n_types", "max_freq", "entropy")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // Catalyst ln is StrictMath.log (fdlibm) — 1 ulp from Math.log on
    // some inputs, absorbed by the gate's ppb quantization; compare
    // within 1e-12 here.
    assert(out(0)._1 == 1L && out(0)._2 == 3L && out(0)._3 == 2L
      && out(0)._4 == 2L)
    assert(math.abs(out(0)._5 - (math.log(3) - (2 * math.log(2)) / 3)) < 1e-12)
    assert(math.abs(out(1)._5) < 1e-15) // ln 4 − (4·ln 4)/4 == exactly 0
    assert(out(2)._4 == 1L && math.abs(out(2)._5 - math.log(4)) < 1e-12)
  }

  test("bigramEntropy: hand-computed ladder on a two-doc group; " +
    "single-word-only groups have no first-order estimate and drop") {
    val docs = Seq((1L, "g", "a b a b"), (2L, "g", "b a"), (3L, "h", "z"))
      .toDF("doc_id", "src", "text")
    val out = Lexical.bigramEntropy(docs, "src", "text")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq("g")) // "h" has zero bigrams
    val (_, n1, n2, uni, bi, cond) = out.head
    // unigrams a=3 b=3 of 6 -> ln 2; bigrams "a b"=2 "b a"=2 of 4 -> ln 2
    assert(n1 == 6L && n2 == 4L)
    assert(math.abs(uni - math.log(2)) < 1e-12)
    assert(math.abs(bi - math.log(2)) < 1e-12)
    assert(math.abs(cond) < 1e-12)
  }

  test("heapsLaw: two-point exact fit, totals, and the 1-point-group " +
    "guard") {
    val docs = Seq((10L, "g", "a b"), (20L, "g", "a c"),
      (100L, "h", "z z")).toDF("doc_id", "src", "text")
    val out = Lexical.heapsLaw(docs, "src", "doc_id", "text", points = 2)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    // "h": k=1 thr=50 is an empty decile, so only 1 point -> dropped
    assert(out.map(_._1).toSeq == Seq("g"))
    val (_, np, nTok, nTyp, beta, lnk) = out.head
    assert(np == 2L && nTok == 4L && nTyp == 3L)
    // points: (N=2,V=2) at thr=10, (N=4,V=3) at thr=20; 2-point OLS is
    // the exact line through them
    val slope = (math.log(3) - math.log(2)) / (math.log(4) - math.log(2))
    assert(math.abs(beta - slope) < 1e-12)
    assert(math.abs(lnk - (math.log(2) - slope * math.log(2))) < 1e-12)
  }

  test("zipfSlope: closed-form OLS on a hand-built count profile, and " +
    "the two-phase top-V equals the single-bucket (naive exact) path") {
    // counts: a=4, b=2, c=1 -> ranks 1,2,3
    val docs = Seq((1L, "g", "a a a a b b c")).toDF("doc_id", "src", "text")
    val Array(row) = Lexical.zipfSlope(docs, "src", "text", topV = 64)
      .select("group", "n_points", "c1", "slope", "intercept")
      .as[(String, Long, Long, Double, Double)].collect()
    val (x, y) = (Seq(1.0, 2.0, 3.0).map(math.log),
      Seq(4.0, 2.0, 1.0).map(math.log))
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val sxx = x.map(a => a * a).sum
    val slope = (3 * sxy - sx * sy) / (3 * sxx - sx * sx)
    assert(row._1 == "g" && row._2 == 3L && row._3 == 4L)
    assert(math.abs(row._4 - slope) < 1e-12)
    assert(math.abs(row._5 - (sy - slope * sx) / 3) < 1e-12)

    // 400 distinct words, skewed counts; bucketed phase-1 must be exact
    val big = (0 until 400).flatMap(i =>
      Seq.fill(1 + (i * i) % 97)(f"w$i%03d")).mkString(" ")
    val bigDf = Seq((1L, "g", big)).toDF("doc_id", "src", "text")
    val twoPhase = Lexical.zipfSlope(bigDf, "src", "text", topV = 50)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    val naive = Lexical.zipfSlope(bigDf, "src", "text", topV = 50,
      buckets = 1)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(twoPhase == naive)
    assert(twoPhase.head._2 == 50L)
  }
}
