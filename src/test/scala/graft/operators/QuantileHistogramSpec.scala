package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantileHistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 4 // 16 sub-buckets → relative width ≤ 1/16

  test("bucket rule is monotonic and within the 2^-s relative bound") {
    val vs = (0L until 3000L) ++ Seq(1L << 40, (1L << 40) + 12345L,
      Long.MaxValue / 3)
    val rows = QuantileHistogram.histState(vs.toDF("v"), "v", S)
      .orderBy("bucket_id").collect()
    // buckets ordered by id have non-overlapping, increasing value ranges
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2),
        s"bucket ${a.getLong(0)} max ${a.getLong(3)} overlaps " +
          s"bucket ${b.getLong(0)} min ${b.getLong(2)}")
      case _ =>
    }
    // in-bucket relative width respects the sub-bucket bound
    rows.filter(_.getLong(2) >= (1L << S)).foreach { r =>
      val (lo, hi) = (r.getLong(2), r.getLong(3))
      assert((hi - lo).toDouble / lo <= 1.0 / (1 << S) + 1e-15,
        s"bucket ${r.getLong(0)}: [$lo,$hi]")
    }
  }

  test("values below 2^s are exact: one bucket per value") {
    val st = QuantileHistogram.histState(
      Seq(0L, 1L, 5L, 15L, 5L).toDF("v"), "v", S).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(st == Map(0L -> (1L, 0L, 0L), 1L -> (1L, 1L, 1L),
      5L -> (2L, 5L, 5L), 15L -> (1L, 15L, 15L)))
  }

  test("quantile sandwich: true order statistic lies in [v_min, v_max]") {
    // heavy-tailed: v = i^2 over 1..4000
    val vs = (1L to 4000L).map(i => i * i)
    val df = vs.toDF("v")
    val st = QuantileHistogram.histState(df, "v", S)
    val qs = Seq(250000L, 500000L, 750000L, 950000L, 990000L)
    val got = QuantileHistogram.quantiles(st, qs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == qs.toSet)
    val sorted = vs.sorted
    qs.foreach { q =>
      val (rank, lo, hi) = got(q)
      assert(rank == (q * vs.size + 999999) / 1000000)
      val truth = sorted((rank - 1).toInt)
      assert(lo <= truth && truth <= hi, s"q=$q: $truth not in [$lo,$hi]")
      assert((hi - lo).toDouble / lo <= 1.0 / (1 << S) + 1e-15)
    }
  }

  test("rank edges: 1 ppm hits the minimum, 10^6 ppm the maximum") {
    val st = QuantileHistogram.histState(
      (100L to 10000L).toDF("v"), "v", S)
    val got = QuantileHistogram.quantiles(st, Seq(1L, 1000000L)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(1L)._1 == 1L && got(1L)._2 <= 100L && 100L <= got(1L)._3)
    assert(got(1000000L)._1 == 9901L)
    assert(got(1000000L)._2 <= 10000L && 10000L <= got(1000000L)._3)
  }

  test("merge of split states equals the state of the whole") {
    val a = (1L to 3000L).map(i => i * 3).toDF("v")
    val b = (500L to 1500L).toDF("v")
    val whole = QuantileHistogram.histState(a.union(b), "v", S)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val merged = QuantileHistogram.histMergeState(
      QuantileHistogram.histState(a, "v", S)
        .union(QuantileHistogram.histState(b, "v", S)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(merged == whole)
  }

  test("state is partitioning-invariant") {
    val df = (1L to 5000L).map(i => i * 7).toDF("v")
    val a = QuantileHistogram.histState(df, "v", S).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val b = QuantileHistogram.histState(df.repartition(13), "v", S)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(a == b)
  }

  test("negative values raise; nulls are skipped") {
    intercept[Exception] {
      QuantileHistogram.histState(Seq(3L, -1L).toDF("v"), "v", S)
        .collect()
    }
    val st = QuantileHistogram.histState(
      Seq(Some(3L), None, Some(7L)).toDF("v"), "v", S).collect()
    assert(st.map(_.getLong(1)).sum == 2L)
  }

  test("per-key faces agree with the global faces key by key") {
    val rows = (1L to 2000L).map(i => ("a", i * i)) ++
      (1L to 500L).map(i => ("b", i + 7))
    val df = rows.toDF("k", "v")
    val perKey = QuantileHistogram
      .histStatePerKey(df, "k", "v", S).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val qPerKey = QuantileHistogram.quantilesPerKey(
      QuantileHistogram.histStatePerKey(df, "k", "v", S),
      Seq(500000L, 950000L)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for (k <- Seq("a", "b")) {
      val sub = df.filter(col("k") === k).select("v")
      val g = QuantileHistogram.histState(sub, "v", S).collect()
        .map(r => (k, r.getLong(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(perKey.filter(_._1._1 == k) == g)
      val gq = QuantileHistogram.quantiles(
        QuantileHistogram.histState(sub, "v", S),
        Seq(500000L, 950000L)).collect()
        .map(r => (k, r.getLong(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(qPerKey.filter(_._1._1 == k) == gq)
    }
  }

  test("quantile contract is enforced") {
    val st = QuantileHistogram.histState(Seq(1L).toDF("v"), "v", S)
    intercept[IllegalArgumentException] {
      QuantileHistogram.quantiles(st, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      QuantileHistogram.quantiles(st, Seq(0L))
    }
  }
}
