package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CardinalitySketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KMV is exact below k") {
    val df = (0 until 100).map(i => s"tok$i").toDF("v")
      .union((0 until 100).map(i => s"tok$i").toDF("v")) // dups collapse
    val r = CardinalitySketch.kmvEstimate(df, "v", k = 256).collect().head
    assert(r.getLong(0) == 100) // n_state
    assert(r.getLong(2) == 100) // dv_est == exact
  }

  test("KMV estimate lands within 20% at 8k distinct, k=256") {
    val df = (0 until 8000).map(i => s"value-$i").toDF("v")
    val r = CardinalitySketch.kmvEstimate(df, "v", k = 256).collect().head
    val est = r.getLong(2).toDouble
    assert(math.abs(est - 8000) / 8000 < 0.20, s"dv_est=$est")
  }

  test("KMV result is partitioning-invariant") {
    val df = (0 until 3000).map(i => s"value-$i").toDF("v")
    val a = CardinalitySketch.kmvEstimate(df, "v").collect().head
    val b = CardinalitySketch.kmvEstimate(df.repartition(17), "v")
      .collect().head
    assert(a == b)
  }

  test("per-key KMV: exact small key beside estimated large key") {
    val small = (0 until 50).map(i => ("ks", s"s$i"))
    val large = (0 until 6000).map(i => ("kl", s"l$i"))
    val r = CardinalitySketch
      .kmvPerKey((small ++ large).toDF("key", "v"), "key", "v", k = 256)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r("ks") == 50)
    assert(math.abs(r("kl") - 6000.0) / 6000 < 0.20)
  }

  test("overlap: planted half-overlap recovered, disjoint floors at 0") {
    // a: 0..3999, b: 2000..5999 (overlap 2000), c: disjoint 10k..11k
    val rows = (0 until 4000).map(i => ("a", s"t$i")) ++
      (2000 until 6000).map(i => ("b", s"t$i")) ++
      (10000 until 11000).map(i => ("c", s"t$i"))
    val r = CardinalitySketch
      .kmvOverlap(rows.toDF("key", "v"), "key", "v", k = 256)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    val (_, _, abU, abI) = r(("a", "b"))
    assert(math.abs(abU - 6000.0) / 6000 < 0.25, s"union=$abU")
    assert(math.abs(abI - 2000.0) / 2000 < 0.45, s"intersect=$abI")
    val (_, _, _, acI) = r(("a", "c"))
    assert(acI >= 0) // inclusion-exclusion floored, never negative
  }

  test("overlap refuses key sets beyond the documented cap") {
    val df = (0 until 40).map(i => (s"k$i", "x")).toDF("key", "v")
    intercept[IllegalArgumentException] {
      CardinalitySketch.kmvOverlap(df, "key", "v", maxKeys = 10)
    }
  }

  test("HLL state merges by per-bucket max") {
    val a = (0 until 2000).map(i => s"a$i").toDF("v")
    val b = (1000 until 3000).map(i => s"b$i").toDF("v")
    val merged = CardinalitySketch.hllState(a.union(b), "v")
      .as[(Long, Long)].collect().toMap
    val sa = CardinalitySketch.hllState(a, "v").as[(Long, Long)].collect()
    val sb = CardinalitySketch.hllState(b, "v").as[(Long, Long)].collect()
    val byMax = (sa ++ sb).groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).max
    }
    assert(merged == byMax)
  }

  test("HLL rollup: merged <all> row == whole-corpus estimate; per-key " +
    "rows == solo per-slice estimates") {
    val df = (0 until 3000).map(i => (s"s${i % 3}", s"tok$i"))
      .toDF("src", "v")
    val roll = CardinalitySketch.hllRollup(df, "src", "v", p = 8)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(roll.size == 4) // s0, s1, s2, <all>
    val whole = CardinalitySketch.hllEstimate(df, "v", p = 8).collect().head
    assert(roll("<all>") ==
      ((whole.getLong(0), whole.getLong(1), whole.getLong(2))))
    val s0 = CardinalitySketch.hllEstimate(
      df.filter(col("src") === "s0"), "v", p = 8).collect().head
    assert(roll("s0") == ((s0.getLong(0), s0.getLong(1), s0.getLong(2))))
  }

  test("HLL rollup refuses an input key that collides with the <all> " +
    "sentinel (loud failure, never a silently double-counted rollup)") {
    val df = (0 until 100).map(i => (if (i % 2 == 0) "<all>" else "ok",
      s"tok$i")).toDF("src", "v")
    val e = intercept[Exception] {
      CardinalitySketch.hllRollup(df, "src", "v", p = 8).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("sentinel")), msgs(e).mkString(" | "))
    // and the guard costs nothing on clean keys: same rollup as before
    val clean = (0 until 100).map(i => (s"s${i % 2}", s"tok$i"))
      .toDF("src", "v")
    assert(CardinalitySketch.hllRollup(clean, "src", "v", p = 8)
      .count() == 3) // s0, s1, <all>
  }

  test("HLL raw estimate lands within 25% at 10k distinct, p=8") {
    val df = (0 until 10000).map(i => s"value-$i").toDF("v")
    val r = CardinalitySketch.hllEstimate(df, "v", p = 8).collect().head
    assert(r.getLong(3) == 10000) // dv_exact counts the true hashes
    val est = r.getLong(2).toDouble
    assert(math.abs(est - 10000) / 10000 < 0.25, s"dv_raw=$est")
  }

  test("HLL sum_terms is consistent with the state") {
    val df = (0 until 500).map(i => s"x$i").toDF("v")
    val st = CardinalitySketch.hllState(df, "v").as[(Long, Long)].collect()
    val seenSum = st.map { case (_, rho) => 1L << (45 - rho) }.sum
    val total = seenSum + (256 - st.length) * (1L << 45)
    val r = CardinalitySketch.hllEstimate(df, "v", p = 8).collect().head
    assert(r.getLong(0) == st.length && r.getLong(1) == total)
  }
}
