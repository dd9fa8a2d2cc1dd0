package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series = Seq(
    (1L, 100L, 10.0), (1L, 200L, 30.0), (1L, 400L, 20.0),
    (2L, 100L, 5.0))
    .toDF("k", "ts", "v")

  private def interp(probes: org.apache.spark.sql.DataFrame) =
    TimeSeries.interpolateAt(series, probes, Seq("k"), "ts", "v")
      .select("k", "ts", "t0", "v0", "t1", "v1", "v_interp")
      .as[(Long, Long, Option[Long], Option[Double], Option[Long],
        Option[Double], Option[Double])]
      .collect().toSet

  test("exact hit, interior point, and both extrapolation sides") {
    val got = interp(Seq(
      (1L, 200L, "hit"), (1L, 150L, "mid"), (1L, 50L, "before"),
      (1L, 500L, "after")).toDF("k", "ts", "tag"))
    assert(got == Set(
      // exact hit: equal-ts series point lands in t0, slope term is 0
      (1L, 200L, Some(200L), Some(30.0), Some(400L), Some(20.0), Some(30.0)),
      // interior: halfway between (100,10) and (200,30)
      (1L, 150L, Some(100L), Some(10.0), Some(200L), Some(30.0), Some(20.0)),
      // before first point: constant extrapolation from (100,10)
      (1L, 50L, None, None, Some(100L), Some(10.0), Some(10.0)),
      // after last point: constant extrapolation from (400,20)
      (1L, 500L, Some(400L), Some(20.0), None, None, Some(20.0))))
  }

  test("a key with no series rows yields all-null neighbors") {
    val got = interp(Seq((9L, 100L, "orphan")).toDF("k", "ts", "tag"))
    assert(got == Set((9L, 100L, None, None, None, None, None)))
  }

  test("duplicate series timestamps break ties deterministically " +
    "(max value at-or-before, min value strictly-after)") {
    val dup = Seq(
      (1L, 100L, 1.0), (1L, 100L, 3.0), (1L, 300L, 8.0), (1L, 300L, 6.0))
      .toDF("k", "ts", "v")
    val got = TimeSeries.interpolateAt(dup,
        Seq((1L, 200L)).toDF("k", "ts"), Seq("k"), "ts", "v")
      .select("t0", "v0", "t1", "v1").as[(Long, Double, Long, Double)]
      .collect().toSet
    // ascending value tiebreak: backward last() sees 3.0 last; the
    // descending forward pass sees 6.0 last — and (t,v) stay paired
    assert(got == Set((100L, 3.0, 300L, 6.0)))
  }

  test("null-valued series rows are dropped, never pair-splitting t0/v0") {
    val s = Seq((1L, 100L, Some(10.0)), (1L, 200L, None),
        (1L, 300L, Some(50.0)))
      .toDF("k", "ts", "v")
    val got = TimeSeries.interpolateAt(s,
        Seq((1L, 250L)).toDF("k", "ts"), Seq("k"), "ts", "v")
      .select("t0", "v0", "t1", "v1", "v_interp")
      .as[(Long, Double, Long, Double, Double)].collect().toSet
    // the null row at ts=200 is invisible: neighbors are 100 and 300
    assert(got == Set((100L, 10.0, 300L, 50.0, 40.0)))
  }

  test("probe pass-through columns survive; reserved names are refused") {
    val p = Seq((1L, 150L, "a")).toDF("k", "ts", "tag")
    val out = TimeSeries.interpolateAt(series, p, Seq("k"), "ts", "v")
    assert(out.columns.contains("tag"))
    assert(out.select("tag").as[String].collect().toSeq == Seq("a"))
    val bad = Seq((1L, 150L, 9.9)).toDF("k", "ts", "v_interp")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.interpolateAt(series, bad, Seq("k"), "ts", "v")
    }
    assert(e.getMessage.contains("v_interp"))
    intercept[IllegalArgumentException] {
      TimeSeries.interpolateAt(series, p, Seq.empty, "ts", "v")
    }
  }

  test("ewma replays the hand-computed recurrence, seeds at the first " +
    "point, drops null values, and refuses bad arguments") {
    val df = Seq(
      (1L, 100L, Some(2.0)), (1L, 200L, Some(3.0)), (1L, 300L, Some(4.0)),
      (1L, 250L, None), // null value: dropped, never poisons the fold
      (2L, 100L, Some(7.0))) // single point: ewma = the point itself
      .toDF("k", "ts", "v")
    val got = TimeSeries.ewma(df, Seq("k"), "ts", "v", alpha = 0.3)
      .select("k", "n_points", "ewma").as[(Long, Long, Double)]
      .collect().toSet
    // k=1: seed 2.0; then 0.3*3 + 0.7*2 = 2.3; then 0.3*4 + 0.7*2.3
    val step1 = 0.3 * 3.0 + (1.0 - 0.3) * 2.0
    val step2 = 0.3 * 4.0 + (1.0 - 0.3) * step1
    assert(got == Set((1L, 3L, step2), (2L, 1L, 7.0)))
    intercept[IllegalArgumentException] {
      TimeSeries.ewma(df, Seq.empty, "ts", "v", alpha = 0.3)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.ewma(df, Seq("k"), "ts", "v", alpha = 0.0)
    }
  }

  test("ewma ties at equal timestamps order by value, so the fold is " +
    "run-deterministic") {
    val df = Seq((1L, 100L, 5.0), (1L, 100L, 1.0), (1L, 200L, 2.0))
      .toDF("k", "ts", "v")
    val got = TimeSeries.ewma(df, Seq("k"), "ts", "v", alpha = 0.5)
      .select("ewma").as[Double].head()
    // sort (ts, v): 1.0 then 5.0 then 2.0 → seed 1, 0.5*5+0.5*1=3, 0.5*2+0.5*3=2.5
    assert(got == 2.5)
  }

  test("rollingStats: trailing-N frame grows then slides, per key, with " +
    "exact sums and mean") {
    val df = Seq(
      (1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 4.0), (1L, 4L, 8.0),
      (2L, 1L, 5.0))
      .toDF("k", "seq", "v")
    val got = TimeSeries.rollingStats(df, Seq("k"), Seq("seq"), "v", nRows = 3)
      .select("k", "seq", "n_window", "roll_sum", "roll_min", "roll_max",
        "roll_mean")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSet
    assert(got == Set(
      (1L, 1L, 1L, 1.0, 1.0, 1.0, 1.0),
      (1L, 2L, 2L, 3.0, 1.0, 2.0, 1.5),
      (1L, 3L, 3L, 7.0, 1.0, 4.0, 7.0 / 3.0),
      (1L, 4L, 3L, 14.0, 2.0, 8.0, 14.0 / 3.0), // row 1 retracted
      (2L, 1L, 1L, 5.0, 5.0, 5.0, 5.0)))
    intercept[IllegalArgumentException] {
      TimeSeries.rollingStats(df, Seq("k"), Seq.empty, "v", 3)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.rollingStats(df, Seq("k"), Seq("seq"), "v", 0)
    }
  }

  test("forward pass uses a running frame, not UnboundedFollowing") {
    val p = Seq((1L, 150L)).toDF("k", "ts")
    val plan = TimeSeries.interpolateAt(series, p, Seq("k"), "ts", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("unboundedfollowing"),
      s"forward neighbor must not re-aggregate to partition end:\n$plan")
  }

  test("seasonal: pure sine-like cycle has flat trend, zero remainder") {
    import org.apache.spark.sql.functions.col
    // period 4, value depends only on phase: x = (10, 20, 30, 40)
    // repeating over 12 buckets of 1000 us. Trend = grand mean = 25,
    // seasonal = phase mean - 25, remainder = 0 exactly.
    val rows = (0 until 12).map(t =>
      (t * 1000L + 1, Seq(10.0, 20.0, 30.0, 40.0)(t % 4)))
    val df = rows.toDF("us", "v")
    val r = TimeSeries.seasonalDecompose(df, col("us"), col("v"),
        bucketUs = 1000L, period = 4)
      .orderBy("t")
      .select("t", "phase", "x", "trend", "seasonal", "remainder")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(r.length == 12 - 4) // 2 edge buckets lost each side
    r.foreach { case (t, ph, x, trend, seas, rem) =>
      assert(ph == t % 4)
      assert(x == Seq(10.0, 20.0, 30.0, 40.0)((t % 4).toInt))
      assert(trend == 25.0)
      assert(seas == x - 25.0)
      assert(rem == 0.0)
    }
  }

  test("seasonal: a level shift shows up in the trend, not the seasonal") {
    import org.apache.spark.sql.functions.col
    // constant 10 then constant 30: seasonal ~ 0 (all phases equal mass),
    // trend ramps through the shift, remainder bounded
    val rows = (0 until 24).map(t => (t * 10L, if (t < 12) 10.0 else 30.0))
    val df = rows.toDF("us", "v")
    val r = TimeSeries.seasonalDecompose(df, col("us"), col("v"),
        bucketUs = 10L, period = 4)
      .orderBy("t")
      .select("t", "trend", "seasonal")
      .as[(Long, Double, Double)].collect()
    assert(r.head._2 == 10.0 && r.last._2 == 30.0)
    // phases see 3 lows + 3 highs each -> seasonal exactly 0
    r.foreach { case (_, _, s) => assert(math.abs(s) < 1e-12) }
    // trend is monotone non-decreasing through the shift
    assert(r.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("seasonal: gaps suppress trend rows; odd period refused") {
    import org.apache.spark.sql.functions.col
    val rows = (0 until 12).filter(_ != 6).map(t => (t * 10L, 1.0))
    val df = rows.toDF("us", "v")
    val r = TimeSeries.seasonalDecompose(df, col("us"), col("v"),
        bucketUs = 10L, period = 4).select("t")
      .as[Long].collect().toSet
    // interior buckets whose full 5-window exists and excludes the gap
    assert(!r.contains(6L) && !r.exists(t => math.abs(t - 6) <= 2))
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalDecompose(df, col("us"), col("v"), 10L, 5)
    }
  }

  private def acf(rows: Seq[(Long, Double)], maxLag: Int) = {
    import org.apache.spark.sql.functions.col
    TimeSeries.autocorrelation(rows.toDF("us", "v"), col("us"), col("v"),
        bucketUs = 10L, maxLag = maxLag)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
  }

  test("acf: alternating series, exact hand values") {
    // x = [1,-1,1,-1]: mean 0, den 4; lag1 = -3/4, lag2 = +2/4
    val got = acf(Seq((0L, 1.0), (10L, -1.0), (20L, 1.0), (30L, -1.0)),
      maxLag = 2)
    assert(got(1L) == ((3L, 4L, -0.75)))
    assert(got(2L) == ((2L, 4L, 0.5)))
  }

  test("acf: gaps shrink n_pairs instead of fabricating zeros") {
    // buckets 0,1,3 — lag 1 pairs only (0,1); lag 2 only (1,3)
    val got = acf(Seq((0L, 2.0), (10L, 4.0), (30L, 8.0)), maxLag = 3)
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L && got(3L)._1 == 1L)
    assert(got.values.forall(_._2 == 3L))
  }

  test("acf: constant series scores zero by definition") {
    val got = acf(Seq((0L, 5.0), (10L, 5.0), (20L, 5.0)), maxLag = 2)
    assert(got(1L)._3 == 0.0 && got(2L)._3 == 0.0)
  }

  private def ccf(a: Seq[(Long, Double)], b: Seq[(Long, Double)],
      maxLag: Int) = {
    import org.apache.spark.sql.functions.col
    TimeSeries.crossCorrelation(
        a.toDF("us", "v"), col("us"), col("v"),
        b.toDF("us", "v"), col("us"), col("v"),
        bucketUs = 10L, maxLag = maxLag)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._5)).toMap
  }

  test("ccf: a series perfectly trailing by one bucket peaks at lag +1") {
    val a = Seq((0L, 1.0), (10L, 2.0), (20L, 3.0), (30L, 4.0))
    val b = Seq((10L, 1.0), (20L, 2.0), (30L, 3.0), (40L, 4.0))
    val got = ccf(a, b, maxLag = 2)
    assert(got(1L) == ((4L, 1.0))) // all four pairs line up exactly
    assert(got(0L) == ((3L, 0.25))) // hand-computed partial overlap
  }

  test("ccf: a constant side scores zero everywhere") {
    val a = Seq((0L, 1.0), (10L, 2.0), (20L, 3.0))
    val b = Seq((0L, 7.0), (10L, 7.0), (20L, 7.0))
    val got = ccf(a, b, maxLag = 1)
    assert(got.values.forall(_._2 == 0.0))
  }
}
