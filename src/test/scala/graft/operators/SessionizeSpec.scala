package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessionize: gaps over the timeout open new sessions, per key") {
    val ev = Seq(
      (1L, 100L), (1L, 150L), (1L, 400L), // gap 250 > 200 → new session
      (1L, 450L),
      (2L, 100L)) // separate key restarts numbering
      .toDF("user_id", "ts")
    val got = Sessionize.sessionize(ev, Seq("user_id"), "ts", gap = 200L)
      .select("user_id", "ts", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 100L, 1L), (1L, 150L, 1L), (1L, 400L, 2L), (1L, 450L, 2L),
      (2L, 100L, 1L)))
  }

  test("rangeJoin matches a naive cross-join filter exactly, including " +
    "bucket-boundary rows, and never duplicates a pair") {
    val left = (0L until 40L).map(i => (i % 3, i * 7)).toDF("k", "ts")
    val right = (0L until 60L).map(i => (i % 3, i * 5 + 1))
      .toDF("k", "ts").withColumnRenamed("ts", "rts0")
      .select(col("k"), col("rts0").as("ts"))
    val (lo, hi) = (-10L, 25L)
    val fast = Sessionize.rangeJoin(left, right, Seq("k"), "ts", lo, hi)
      .select("k", "ts", "r_ts").as[(Long, Long, Long)].collect().toSeq
    val naive = left.as("l").join(right.as("r"), $"l.k" === $"r.k" &&
        $"r.ts".between($"l.ts" + lo, $"l.ts" + hi))
      .select($"l.k", $"l.ts", $"r.ts").as[(Long, Long, Long)]
      .collect().toSeq
    assert(fast.sorted == naive.sorted) // same pairs, no dupes, no misses
    assert(fast.nonEmpty)
  }

  test("rangeJoin buckets stay exact past 2^53 (nanosecond-scale ts)") {
    val base = 4000000000000000000L // ~4e18, beyond double precision
    val left = Seq((1L, base)).toDF("k", "ts")
    val right = Seq((1L, base - 3L), (1L, base + 3L), (1L, base + 100L))
      .toDF("k", "ts")
    val got = Sessionize.rangeJoin(left, right, Seq("k"), "ts", -5L, 5L)
      .select("r_ts").as[Long].collect().toSet
    assert(got == Set(base - 3L, base + 3L))
  }
}
