package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CountMinSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed stream: value i appears i+1 times, 0 ≤ i < n
  private def skewed(n: Int) =
    (0 until n).flatMap(i => Seq.fill(i + 1)(s"tok$i")).toDF("v")

  private def exactCounts(n: Int): Map[String, Long] =
    (0 until n).map(i => s"tok$i" -> (i + 1).toLong).toMap

  test("state never exceeds d×m cells and total mass is d×N") {
    val df = skewed(200) // N = 20100
    val st = CountMinSketch.cmsState(df, "v", d = 3, m = 64).collect()
    assert(st.length <= 3 * 64)
    assert(st.map(_.getLong(2)).sum == 3L * 20100)
    // every row_id carries the full mass once
    val perRow = st.groupBy(_.getLong(0)).map(_._2.map(_.getLong(2)).sum)
    assert(perRow.toSet == Set(20100L))
  }

  test("one-sided guarantee: est >= exact for every probe") {
    val df = skewed(300)
    val st = CountMinSketch.cmsState(df, "v", d = 3, m = 64)
    val probes = (0 until 300).map(i => s"tok$i").toDF("p")
    val est = CountMinSketch.cmsEstimate(st, probes, "p", d = 3, m = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = exactCounts(300)
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, c) => assert(est(k) >= c, s"$k: ${est(k)} < $c") }
    // m=64 over 300 keys MUST collide somewhere: the bound is one-sided
    assert(exact.exists { case (k, c) => est(k) > c })
  }

  test("exact when the width dwarfs the key set") {
    val df = skewed(40)
    val st = CountMinSketch.cmsState(df, "v", d = 4, m = 1 << 16)
    val probes = (0 until 40).map(i => s"tok$i").toDF("p")
    val est = CountMinSketch.cmsEstimate(st, probes, "p", d = 4, m = 1 << 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exactCounts(40))
  }

  test("unseen probe estimates 0 when its cells are empty") {
    val df = Seq("a").toDF("v")
    val st = CountMinSketch.cmsState(df, "v", d = 4, m = 1 << 16)
    val est = CountMinSketch
      .cmsEstimate(st, Seq("never-seen").toDF("p"), "p", d = 4, m = 1 << 16)
      .collect().head
    assert(est.getLong(1) == 0L)
  }

  test("merge of split states equals the state of the whole") {
    val a = skewed(150)
    val b = (0 until 90).map(i => s"tok$i").toDF("v") // overlaps a
    val whole = CountMinSketch.cmsState(a.union(b), "v", d = 3, m = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = CountMinSketch.cmsMergeState(
      CountMinSketch.cmsState(a, "v", d = 3, m = 64)
        .union(CountMinSketch.cmsState(b, "v", d = 3, m = 64)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("state and estimates are partitioning-invariant") {
    val df = skewed(120)
    val st1 = CountMinSketch.cmsState(df, "v", d = 3, m = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val st2 = CountMinSketch.cmsState(df.repartition(17), "v", d = 3, m = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(st1 == st2)
  }

  test("inner product: one-sided join-size estimate, exact when wide") {
    // A: key i appears i+1 times (i<40); B: key i appears 2 times (i<25)
    val a = (0 until 40).flatMap(i => Seq.fill(i + 1)(s"k$i")).toDF("v")
    val b = (0 until 25).flatMap(i => Seq.fill(2)(s"k$i")).toDF("v")
    val truth = (0 until 25).map(i => (i + 1).toLong * 2).sum
    // wide: no collisions → exact
    val wide = CountMinSketch.cmsInnerProduct(
      CountMinSketch.cmsState(a, "v", 3, 1 << 16),
      CountMinSketch.cmsState(b, "v", 3, 1 << 16), 3)
      .collect().head.getLong(0)
    assert(wide == truth)
    // narrow: collisions only ADD → one-sided
    val narrow = CountMinSketch.cmsInnerProduct(
      CountMinSketch.cmsState(a, "v", 3, 8),
      CountMinSketch.cmsState(b, "v", 3, 8), 3)
      .collect().head.getLong(0)
    assert(narrow >= truth)
  }

  test("inner product: disjoint key sets estimate 0 under a wide sketch") {
    val a = (0 until 30).map(i => s"a$i").toDF("v")
    val b = (0 until 30).map(i => s"b$i").toDF("v")
    val est = CountMinSketch.cmsInnerProduct(
      CountMinSketch.cmsState(a, "v", 3, 1 << 16),
      CountMinSketch.cmsState(b, "v", 3, 1 << 16), 3)
      .collect().head.getLong(0)
    assert(est == 0L)
  }

  test("inner product with itself is the exact F2 when wide") {
    val a = (0 until 50).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i")).toDF("v")
    val st = CountMinSketch.cmsState(a, "v", 3, 1 << 16)
    val f2 = CountMinSketch.cmsInnerProduct(st, st, 3)
      .collect().head.getLong(0)
    val truth = (0 until 50).map(i => { val c = (i % 5 + 1).toLong; c * c }).sum
    assert(f2 == truth)
  }

  test("dimension contract is enforced") {
    val df = Seq("x").toDF("v")
    intercept[IllegalArgumentException] {
      CountMinSketch.cmsState(df, "v", d = 0, m = 64)
    }
    intercept[IllegalArgumentException] {
      CountMinSketch.cmsState(df, "v", d = 3, m = 1)
    }
  }
}
