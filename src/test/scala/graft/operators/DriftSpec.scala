package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (String, Long)*) =
    rows.zipWithIndex
      .map { case ((g, bin), i) => (i.toLong, g, bin) }
      .toDF("id", "g", "bin")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Drift.psiKl(df, "g", "base", col("bin"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap

  test("identical distributions score ~0; disjoint ones score high") {
    val same = corpus(
      (Seq.fill(4)("base") ++ Seq.fill(4)("g1"))
        .zip(Seq(0L, 0L, 1L, 1L, 0L, 0L, 1L, 1L)): _*)
    val r = run(same)("g1")
    assert(r._1 == 2 && r._2 == 4 && r._3 == 4)
    assert(math.abs(r._4) < 1e-15 && math.abs(r._5) < 1e-15)

    val shifted = corpus(
      (Seq.fill(4)("base") ++ Seq.fill(4)("g2"))
        .zip(Seq(0L, 0L, 0L, 0L, 9L, 9L, 9L, 9L)): _*)
    val s = run(shifted)("g2")
    assert(s._4 > 1.0) // fully disjoint mass: strong PSI signal
    assert(s._5 > 0.5)
  }

  test("hand-computed PSI on a 2-bin example") {
    // base: 3 in bin0, 1 in bin1; g: 1 in bin0, 3 in bin1
    val df = corpus(("base", 0L), ("base", 0L), ("base", 0L),
      ("base", 1L), ("g", 0L), ("g", 1L), ("g", 1L), ("g", 1L))
    val (nBins, nBase, nCmp, psi, kl) = run(df)("g")
    assert((nBins, nBase, nCmp) == (2L, 4L, 4L))
    val p0 = 4.0 / 6.0; val p1 = 2.0 / 6.0
    val q0 = 2.0 / 6.0; val q1 = 4.0 / 6.0
    val expPsi = (p0 - q0) * math.log(p0 / q0) +
      (p1 - q1) * math.log(p1 / q1)
    val expKl = p0 * math.log(p0 / q0) + p1 * math.log(p1 / q1)
    assert(psi == expPsi && kl == expKl)
    assert(psi > 0 && kl > 0)
  }

  test("bins unique to either side enter the union with smoothing") {
    // base only in bin0, g only in bin1 -> union {0,1} for g
    val df = corpus(("base", 0L), ("g", 1L))
    val (nBins, _, _, psi, _) = run(df)("g")
    assert(nBins == 2)
    // p = (2/3, 1/3), q = (1/3, 2/3) after +1 smoothing
    val exp = (2.0 / 3 - 1.0 / 3) * math.log(2.0) +
      (1.0 / 3 - 2.0 / 3) * math.log(0.5)
    assert(math.abs(psi - exp) < 1e-15)
  }

  test("deterministic under repartition (ordered fold)") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map(i =>
      (if (i % 3 == 0) "base" else s"g${i % 4}", rnd.nextInt(12).toLong))
    val df = corpus(rows: _*)
    val a = run(df)
    val b = run(df.repartition(17))
    assert(a == b)
  }

  private def embDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("label", "embedding")

  test("centroid drift: hand-computed integer evidence") {
    // base label 0: centroid (0.5, 0.5) over 2 vecs; label 1: (1, 1)
    // S_b = (1e6, 1e6), n_b = 2; S_g = (1e6, 1e6), n_g = 1
    // per dim: (1e6·2 − 1e6·1)² = 1e12 → drift_num = 2e12
    val df = embDf(Seq(
      (0L, Seq(1.0f, 0.0f)), (0L, Seq(0.0f, 1.0f)),
      (1L, Seq(1.0f, 1.0f))))
    val got = Drift.centroidDrift(df, "embedding", "label", baseline = 0L)
      .as[(Long, Long, Long, Long, BigDecimal, Long)].collect().toSet
    assert(got ==
      Set((1L, 1L, 2L, 2L, BigDecimal(2000000000000L), 2000000000000L)))
  }

  test("centroid drift: identical distribution scores exactly zero") {
    val df = embDf(Seq(
      (0L, Seq(0.25f, -0.5f)), (0L, Seq(-0.25f, 0.5f)),
      (2L, Seq(0.25f, -0.5f)), (2L, Seq(-0.25f, 0.5f))))
    val got = Drift.centroidDrift(df, "embedding", "label", baseline = 0L)
      .as[(Long, Long, Long, Long, BigDecimal, Long)].collect().toSet
    assert(got == Set((2L, 2L, 2L, 2L, BigDecimal(0), 0L)))
  }

  test("centroid drift is count-normalized, not sum-sensitive") {
    // label 3 has the SAME centroid as base but twice the vectors —
    // cross-multiplication by counts must cancel to zero
    val df = embDf(Seq(
      (0L, Seq(0.5f, 0.5f)),
      (3L, Seq(0.5f, 0.5f)), (3L, Seq(0.5f, 0.5f))))
    val got = Drift.centroidDrift(df, "embedding", "label", baseline = 0L)
      .as[(Long, Long, Long, Long, BigDecimal, Long)].collect().toSet
    assert(got == Set((3L, 2L, 1L, 2L, BigDecimal(0), 0L)))
  }

  test("drift_mod is exactly drift_num mod 2^61-1 (gate-portable face)") {
    // force drift_num past 2^61 so the residue actually reduces:
    // one dim, S_b = 1e12 (v=1e6 at scale 1e6), n_b = 1; S_g = 0, n_g = 1
    // diff = -1e12, sq = 1e24 > p = 2^61-1
    val df = embDf(Seq((0L, Seq(1000000.0f)), (1L, Seq(0.0f))))
    val p = BigDecimal(ImportanceResampling.ModP)
    val got = Drift.centroidDrift(df, "embedding", "label", baseline = 0L)
      .as[(Long, Long, Long, Long, BigDecimal, Long)].collect()
    assert(got.length == 1)
    val (_, _, _, _, num, m) = got(0)
    assert(num > p, s"fixture must exceed the modulus, got $num")
    assert(BigDecimal(m) == num % p)
  }
}
