package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "p1"), // matches r@5
    (1L, 20L, "p2"), // matches r@20 (tie: >= includes equality)
    (1L, 3L, "p0"), // before any right row → null
    (2L, 50L, "p3")) // user 2 has no right rows → null
    .toDF("user_id", "ts", "tag")

  private def right = Seq(
    (1L, 5L, 100L),
    (1L, 20L, 200L),
    (1L, 25L, 300L)) // after every left row → never matched
    .toDF("user_id", "ts", "vid")

  test("latest right row at or before each left ts, per key; unmatched " +
    "lefts get nulls (left-outer asof semantics)") {
    val got = AsOfJoin.asOfJoin(left, right, Seq("user_id"), "ts",
      rightPrefix = "v_")
      .select("user_id", "ts", "tag", "v_vid", "v_ts")
      .as[(Long, Long, String, Option[Long], Option[Long])]
      .collect().toSet
    assert(got == Set(
      (1L, 10L, "p1", Some(100L), Some(5L)),
      (1L, 20L, "p2", Some(200L), Some(20L)),
      (1L, 3L, "p0", None, None),
      (2L, 50L, "p3", None, None)))
  }

  test("tolerance nulls out matches farther back than the bound " +
    "(merge_asof tolerance semantics)") {
    val got = AsOfJoin.asOfJoin(left, right, Seq("user_id"), "ts",
      rightPrefix = "v_", tolerance = Some(2L))
      .select("user_id", "ts", "v_vid")
      .as[(Long, Long, Option[Long])].collect().toSet
    // p1 is 5 ticks after r@5 → out of tolerance; p2 is 0 ticks → kept
    assert(got == Set(
      (1L, 10L, None),
      (1L, 20L, Some(200L)),
      (1L, 3L, None),
      (2L, 50L, None)))
  }

  test("plan shape: one shuffle on the key, no join node (union-window " +
    "formulation)") {
    val plan = AsOfJoin.asOfJoin(left, right, Seq("user_id"), "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "asof must not produce a join node")
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one key shuffle, got $shuffles")
  }
}
