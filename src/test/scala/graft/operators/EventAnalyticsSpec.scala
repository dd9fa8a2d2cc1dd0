package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Day = 86400000000L

  test("cohort retention: first day cohorts, offsets count distinct users") {
    // u1 starts day 0, returns day 0 (twice) and day 2
    // u2 starts day 0, returns day 1; u3 starts day 1 only
    val ev = Seq(
      (1L, 0L * Day + 5L), (1L, 0L * Day + 9L), (1L, 2L * Day + 1L),
      (2L, 0L * Day + 7L), (2L, 1L * Day + 3L),
      (3L, 1L * Day + 2L)).toDF("user_id", "us")
    val got = EventAnalytics.cohortRetention(ev, "user_id", "us")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (0L, 0L) -> 2L, // u1, u2 on their cohort day (u1's dup collapses)
      (0L, 1L) -> 1L, // u2 back next day
      (0L, 2L) -> 1L, // u1 back two days later
      (1L, 0L) -> 1L)) // u3's cohort
  }

  test("funnel: strict ordering, out-of-order steps do not convert") {
    val ev = Seq(
      // u1 converts fully: view@10 click@20 buy@30
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2: purchase BEFORE its click → depth 2, not 3
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // u3: click only → depth 0 (no view to anchor)
      (3L, 10L, "click"),
      // u4: view then nothing
      (4L, 40L, "view")).toDF("user_id", "us", "et")
    val got = EventAnalytics.funnel(ev, "user_id", "us", "et",
      Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got(1L) == ((3L, Some(10L), Some(20L), Some(30L))))
    assert(got(2L) == ((2L, Some(10L), Some(30L), None)))
    assert(got(3L) == ((0L, None, None, None)))
    assert(got(4L) == ((1L, Some(40L), None, None)))
  }

  test("funnel picks the EARLIEST valid chain, not any chain") {
    // view@10 and view@50; click only at 20 — anchored on view@10
    val ev = Seq((1L, 10L, "view"), (1L, 50L, "view"), (1L, 20L, "click"))
      .toDF("user_id", "us", "et")
    val got = EventAnalytics.funnel(ev, "user_id", "us", "et",
      Seq("view", "click")).collect().head
    assert(got.getLong(1) == 2L && got.getLong(2) == 10L &&
      got.getLong(3) == 20L)
  }

  test("funnel: equal timestamps are not strictly after") {
    val ev = Seq((1L, 10L, "view"), (1L, 10L, "click"))
      .toDF("user_id", "us", "et")
    val got = EventAnalytics.funnel(ev, "user_id", "us", "et",
      Seq("view", "click")).collect().head
    assert(got.getLong(1) == 1L)
  }

  test("funnel == funnelChained bitwise on a dense mixed stream") {
    // deterministic pseudo-random stream: 40 users × 25 events, types
    // drawn from steps + noise, timestamps with collisions
    val types = Vector("signup", "view", "click", "purchase", "noise")
    val rows = for {
      u <- 1L to 40L
      i <- 0 until 25
    } yield {
      val h = (u * 2654435761L + i * 40503L) & 0x7fffffffL
      (u, (h % 97L) * 10L, types((h % types.size).toInt))
    }
    val ev = rows.toDF("user_id", "us", "et")
    val steps = Seq("signup", "view", "click", "purchase")
    val a = EventAnalytics.funnel(ev, "user_id", "us", "et", steps)
      .orderBy("user").collect().map(_.toSeq).toSeq
    val b = EventAnalytics.funnelChained(ev, "user_id", "us", "et", steps)
      .orderBy("user").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("funnel: single scan of the event source, one aggregate") {
    val ev = Seq((1L, 10L, "view")).toDF("user_id", "us", "et")
    val plan = EventAnalytics.funnel(ev, "user_id", "us", "et",
      Seq("view", "click")).queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
  }

  test("funnel step contract is enforced") {
    val ev = Seq((1L, 10L, "view")).toDF("user_id", "us", "et")
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(ev, "user_id", "us", "et", Seq.empty)
    }
  }

  test("transition matrix: per-user pairs, row-normalized") {
    // A: x→y→x; B: x→x  ⇒  counts (x,y)=1 (y,x)=1 (x,x)=1; from-x = 2
    val ev = Seq(
      (1L, 1L, 10L, "x"), (1L, 2L, 20L, "y"), (1L, 3L, 30L, "x"),
      (2L, 4L, 10L, "x"), (2L, 5L, 20L, "x"))
      .toDF("user_id", "event_id", "us", "et")
    val got = EventAnalytics.transitionMatrix(ev, "user_id", "us",
        "event_id", "et")
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("x", "y", 1L, 2L, 0.5), ("x", "x", 1L, 2L, 0.5),
      ("y", "x", 1L, 1L, 1.0)))
  }

  test("transition matrix: equal timestamps order by the id tiebreaker") {
    val ev = Seq((7L, 1L, 50L, "a"), (7L, 2L, 50L, "b"))
      .toDF("user_id", "event_id", "us", "et")
    val got = EventAnalytics.transitionMatrix(ev, "user_id", "us",
        "event_id", "et")
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == Set(("a", "b", 1L, 1L, 1.0)))
  }

  test("burstiness: regular arrivals score 0, bursty arrivals > 1") {
    // global span = buckets 0..3 (T = 4)
    // x: one event per bucket, c = [1,1,1,1] → num = 4·4 − 16 = 0
    // y: c = [3,0,0,1] → Σc = 4, Σc² = 10 → num = 40 − 16 = 24, den 16
    val ev = Seq(
      (10L, "x"), (110L, "x"), (210L, "x"), (310L, "x"),
      (1L, "y"), (2L, "y"), (3L, "y"), (399L, "y"))
      .toDF("us", "et")
    val got = EventAnalytics.burstiness(ev, "et", "us", bucketUs = 100L)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("x") == (("x", 4L, 4L, 4L, 0L, 16L, 0.0)))
    assert(got("y") == (("y", 4L, 4L, 10L, 24L, 16L, 1.5)))
  }

  test("cohort/burstiness day buckets FLOOR negative epochs") {
    // us = −1 (pre-1970) belongs to day −1, not day 0: truncating div
    // would fold it into day 0 and break the offset arithmetic
    val ev = Seq((1L, -1L), (1L, 5L)).toDF("user_id", "us")
    val got = EventAnalytics.cohortRetention(ev, "user_id", "us")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((-1L, 0L), (-1L, 1L)))
    val b = EventAnalytics.burstiness(
      Seq((-1L, "x"), (5L, "x")).toDF("us", "et"), "et", "us", 100L)
      .select("t_span").as[Long].collect().head
    assert(b == 2L) // buckets −1 and 0
  }

  test("last-touch attribution: latest strictly-preceding touch wins, " +
    "same-instant touches never attribute, lookback nulls stale ones") {
    val ev = Seq(
      // u1: ad@10, email@20, buy@30 → email credited, lag 10
      (1L, 1L, 10L, "ad"), (1L, 2L, 20L, "email"), (1L, 3L, 30L, "buy"),
      // u2: ad@50 arrives AT the purchase instant; ad@40 earlier →
      // the same-instant ad must NOT win, the @40 one must
      (2L, 4L, 40L, "ad"), (2L, 5L, 50L, "ad"), (2L, 6L, 50L, "buy"),
      // u3: no touch at all → unattributed row, null touch columns
      (3L, 7L, 60L, "buy"),
      // u4: touch 100 us before the buy, lookback 50 → stale → null
      (4L, 8L, 100L, "ad"), (4L, 9L, 200L, "buy"))
      .toDF("user_id", "event_id", "us", "et")
    val got = EventAnalytics.lastTouchAttribution(ev, "user_id", "us",
      "event_id", "et", Seq("ad", "email"), "buy", lookbackUs = None)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)), Option(r.get(4)), Option(r.get(6)))).toMap
    assert(got(1L) == ((Some(2L), Some("email"), Some(10L))))
    assert(got(2L) == ((Some(4L), Some("ad"), Some(10L))))
    assert(got(3L) == ((None, None, None)))
    assert(got(4L) == ((Some(8L), Some("ad"), Some(100L))))
    val windowed = EventAnalytics.lastTouchAttribution(ev, "user_id", "us",
      "event_id", "et", Seq("ad", "email"), "buy", lookbackUs = Some(50L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(windowed(1L) == Some(2L) && windowed(4L).isEmpty)
  }

  test("linear attribution: in-window touches share credit, bucket " +
    "boundaries don't lose pairs, unattributed convs surface") {
    val lb = 100L
    val ev = Seq(
      // u1: touches at 10, 60; buy at 110 → both in window (lag 100, 50)
      (1L, 1L, 10L, "ad"), (1L, 2L, 60L, "ad"), (1L, 3L, 110L, "buy"),
      // u2: touch at 199, buy at 250 — different lookback buckets
      // (1 vs 2), must still pair via the bucket-1 explode
      (2L, 4L, 199L, "ad"), (2L, 5L, 250L, "buy"),
      // u3: touch too old (lag 101) → unattributed
      (3L, 6L, 0L, "ad"), (3L, 7L, 101L, "buy"),
      // u4: same-instant touch only → unattributed (strictly before)
      (4L, 8L, 300L, "ad"), (4L, 9L, 300L, "buy"))
      .toDF("user_id", "event_id", "us", "et")
    val got = EventAnalytics.linearAttribution(ev, "user_id", "us",
      "event_id", "et", Seq("ad"), "buy", lookbackUs = lb)
      .collect().map(r => (r.getLong(1), Option(r.get(3))) ->
        (r.getLong(6), Option(r.get(7)))).toMap
    assert(got((3L, Some(1L))) == ((2L, Some(500000L))))
    assert(got((3L, Some(2L))) == ((2L, Some(500000L))))
    assert(got((5L, Some(4L))) == ((1L, Some(1000000L))))
    assert(got((7L, None)) == ((0L, None)))
    assert(got((9L, None)) == ((0L, None)))
    assert(got.size == 5)
  }

  test("transition matrix: users never mix") {
    val ev = Seq((1L, 1L, 10L, "x"), (2L, 2L, 20L, "y"))
      .toDF("user_id", "event_id", "us", "et")
    assert(EventAnalytics.transitionMatrix(ev, "user_id", "us",
      "event_id", "et").count() == 0L)
  }
}
