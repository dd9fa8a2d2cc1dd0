package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.DataChecks.Check._

class DataChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def facts = Seq(
    (Some(1L), Some("a"), Some(5.0)),
    (Some(1L), Some("a"), Some(5.0)), // dup of row 1 for Unique
    (Some(2L), Some("x"), Some(-1.0)), // bad code, out of range
    (None, Some("b"), None), // null key, null value
    (Some(9L), None, Some(100.0))) // orphan key, out of range
    .toDF("k", "code", "v")

  private def dim = Seq(1L, 2L, 3L).toDF("dk")

  private def report = DataChecks.validate(facts, Seq(
    NotNull("k"),
    InRange("v", 0, 10),
    Accepted("code", Seq("a", "b")),
    Satisfies("v_small_when_a", !(col("code") === "a") || col("v") < 6),
    Unique(Seq("k", "code")),
    ForeignKey("k", dim, "dk")))
    .collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap

  test("every rule type counts its violations exactly") {
    val r = report
    assert(r(("not_null", "k")) == (5L, 1L, false))
    // nulls pass range/accepted (NotNull owns them)
    assert(r(("in_range", "v")) == (5L, 2L, false)) // -1 and 100
    assert(r(("accepted_values", "code")) == (5L, 1L, false)) // 'x'
    // null code rows: predicate null-safe -> (code=='a') null => !null
    // coalesced to violation only when pred itself is null/false:
    // rows: (a,5) pass<6, (a,5) pass, (x,-1) pass (not a), (b,null)
    // pred = true||... -> true, (null,100) -> null => violation
    assert(r(("satisfies", "v_small_when_a")) == (5L, 1L, false))
    assert(r(("unique", "k,code")) == (5L, 1L, false)) // one extra copy
    // FK population excludes the null key; 9 is the only orphan
    assert(r(("foreign_key", "k")) == (4L, 1L, false))
  }

  test("a clean table passes everything; bad args refused") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "code")
    val rep = DataChecks.validate(clean, Seq(
      NotNull("k"), Unique(Seq("k")),
      ForeignKey("k", dim, "dk"), Accepted("code", Seq("a", "b"))))
      .collect()
    assert(rep.length == 4 && rep.forall(_.getBoolean(4)))
    assert(rep.forall(_.getLong(3) == 0L))
    intercept[IllegalArgumentException] {
      DataChecks.validate(clean, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      DataChecks.validate(clean, Seq(NotNull("k"), NotNull("k")))
    }
  }

  test("empty table: zero populations, all rules pass") {
    val empty = Seq.empty[(Option[Long], Option[String], Option[Double])]
      .toDF("k", "code", "v")
    val rep = DataChecks.validate(empty, Seq(
      NotNull("k"), InRange("v", 0, 10), Unique(Seq("k")),
      ForeignKey("k", dim, "dk")))
      .collect()
    assert(rep.length == 4)
    assert(rep.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getBoolean(4)))
  }
}
