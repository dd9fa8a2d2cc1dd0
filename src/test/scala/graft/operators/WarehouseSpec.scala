package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SCD2 merge contract: no-op on equal attrs (null-safe), close+open on
  * change, first version for unseen keys, closed rows pass through.
  */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("scd2Merge closes changed, keeps unchanged, inserts new") {
    val history = Seq(
      // closed old version passes through untouched
      (1L, Option("a0"), d("2000-01-01"), Option(d("2001-01-01"))),
      (1L, Option("a1"), d("2001-01-01"), None), // will change
      (2L, Option("b1"), d("2001-01-01"), None), // no-op (equal attrs)
      (3L, Option(null: String), d("2001-01-01"), None), // null attr, no-op
      (4L, Option("d1"), d("2001-01-01"), None)  // untouched (no update)
    ).toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq(
      (1L, Option("a2"), d("2002-06-01")),
      (2L, Option("b1"), d("2002-06-01")),
      (3L, Option(null: String), d("2002-06-01")),
      (5L, Option("e1"), d("2002-06-01"))  // first-seen key
    ).toDF("k", "attr", "ts")
    val out = Warehouse.scd2Merge(history, updates, "k", Seq("attr"), "ts")
      .orderBy("k", "valid_from")
      .select("k", "attr", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString)))
    assert(out.toSeq == Seq(
      (1L, Some("a0"), "2000-01-01", Some("2001-01-01")),
      (1L, Some("a1"), "2001-01-01", Some("2002-06-01")),
      (1L, Some("a2"), "2002-06-01", None),
      (2L, Some("b1"), "2001-01-01", None),
      (3L, None, "2001-01-01", None),
      (4L, Some("d1"), "2001-01-01", None),
      (5L, Some("e1"), "2002-06-01", None)))
  }

  test("null-to-value and value-to-null attr transitions count as changes") {
    val history = Seq(
      (1L, Option(null: String), d("2001-01-01"), Option.empty[java.sql.Date]),
      (2L, Option("x"), d("2001-01-01"), Option.empty[java.sql.Date])
    ).toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq(
      (1L, Option("now-set"), d("2002-01-01")),
      (2L, Option(null: String), d("2002-01-01"))
    ).toDF("k", "attr", "ts")
    val out = Warehouse.scd2Merge(history, updates, "k", Seq("attr"), "ts")
    assert(out.filter(col("valid_to").isNotNull).count() == 2)
    assert(out.filter(col("valid_to").isNull).count() == 2)
  }

  test("versionAt picks the version valid at each fact ts; no match -> null") {
    val history = Seq(
      (1L, "v1", d("2000-01-01"), Option(d("2001-01-01"))),
      (1L, "v2", d("2001-01-01"), None),
      (2L, "w1", d("2005-01-01"), None)
    ).toDF("k", "attr", "valid_from", "valid_to")
    val facts = Seq(
      (10L, 1L, d("2000-06-01")), // inside closed v1
      (11L, 1L, d("2001-01-01")), // boundary: from inclusive -> v2
      (12L, 1L, d("2009-01-01")), // open-ended v2
      (13L, 2L, d("2004-12-31")), // before first version -> null
      (14L, 3L, d("2004-12-31"))  // unknown key -> null
    ).toDF("fact_id", "k", "ts")
    val out = Warehouse.versionAt(facts, history, "k", "ts")
      .orderBy("fact_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(3))))
    assert(out.toSeq == Seq((10L, Some("v1")), (11L, Some("v2")),
      (12L, Some("v2")), (13L, None), (14L, None)))
  }

  test("changeLogApply: LWW upserts, deletes, resurrection, passthrough") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "attr")
    val changes = Seq(
      (1L, "a1", 1L, "u"), (1L, "a2", 5L, "u"), // later update wins
      (2L, "x", 2L, "u"), (2L, "x", 3L, "d"),   // delete beats update
      (3L, "zz", 1L, "d"), (3L, "c2", 2L, "u"), // update after delete
      (9L, "new", 1L, "i")                      // unseen key insert
    ).toDF("k", "attr", "ts", "op")
    val out = Warehouse.changeLogApply(snap, changes, "k", Seq("attr"), "ts")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (1L, "a2"), (3L, "c2"), (4L, "d"), (9L, "new")))
  }

  test("changeLogApply ties on ts break deterministically by op then attrs") {
    val snap = Seq((1L, "a")).toDF("k", "attr")
    // same ts: 'u' > 'i' > 'd' lexicographically — update wins
    val changes = Seq((1L, "del", 7L, "d"), (1L, "upd", 7L, "u"))
      .toDF("k", "attr", "ts", "op")
    val out = Warehouse.changeLogApply(snap, changes, "k", Seq("attr"), "ts")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "upd")))
  }
}
