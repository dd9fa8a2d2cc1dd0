package graft.ops

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ComboPlanner._

/** Golden expectations from the reference's own suite
  * (`tests/core/test_combo.py:22-118`) plus the documented end-edge quirk.
  */
class ComboPlannerSpec extends AnyFunSuite {

  private def d(s: String): LocalDate = LocalDate.parse(s)

  test("fill_days include/exclude combinations (test_combo.py:22-34)") {
    val (s, e) = (d("2020-01-01"), d("2020-01-03"))
    assert(fillDays(s, e, includeStart = true, includeEnd = true) ==
      Seq(d("2020-01-01"), d("2020-01-02"), d("2020-01-03")))
    assert(fillDays(s, e, includeStart = true, includeEnd = false) ==
      Seq(d("2020-01-01"), d("2020-01-02")))
    assert(fillDays(s, e, includeStart = false, includeEnd = false) ==
      Seq(d("2020-01-02")))
    assert(fillDays(s, e, includeStart = false, includeEnd = true) ==
      Seq(d("2020-01-02"), d("2020-01-03")))
  }

  test("quarterly only, one year (test_combo.py:51-59)") {
    val r = decompose(d("2020-01-01"), d("2020-12-31"))
    assert(r.quarters == Seq(QuarterScan(2020, 1, All), QuarterScan(2020, 2, All),
      QuarterScan(2020, 3, All), QuarterScan(2020, 4, All)))
    assert(r.days.isEmpty)
  }

  test("quarterly only, multiple years (test_combo.py:61-75)") {
    val r = decompose(d("2018-10-01"), d("2020-06-30"))
    assert(r.quarters == Seq(
      QuarterScan(2018, 4, All), QuarterScan(2019, 1, All),
      QuarterScan(2019, 2, All), QuarterScan(2019, 3, All),
      QuarterScan(2019, 4, All), QuarterScan(2020, 1, All),
      QuarterScan(2020, 2, All)))
    assert(r.days.isEmpty)
  }

  test("daily only: single + multiple days (test_combo.py:77-91)") {
    val one = decompose(d("2020-12-10"), d("2020-12-10"))
    assert(one.quarters.isEmpty && one.days == Seq(d("2020-12-10")))
    val three = decompose(d("2020-12-10"), d("2020-12-12"))
    assert(three.quarters.isEmpty &&
      three.days == Seq(d("2020-12-10"), d("2020-12-11"), d("2020-12-12")))
  }

  test("mixed daily/quarterly (test_combo.py:93-118)") {
    val c1 = decompose(d("2019-12-28"), d("2020-04-01"))
    assert(c1.quarters == Seq(QuarterScan(2020, 1, All)))
    assert(c1.days.map(_.toString) == Seq("2019-12-28", "2019-12-29",
      "2019-12-30", "2019-12-31", "2020-04-01"))

    val c2 = decompose(d("2020-03-30"), d("2020-10-02"))
    assert(c2.quarters == Seq(QuarterScan(2020, 2, All), QuarterScan(2020, 3, All)))
    assert(c2.days.map(_.toString) == Seq("2020-03-30", "2020-03-31",
      "2020-10-01", "2020-10-02"))

    val c3 = decompose(d("2020-01-01"), d("2020-04-02"))
    assert(c3.quarters == Seq(QuarterScan(2020, 1, All)))
    assert(c3.days.map(_.toString) == Seq("2020-04-01", "2020-04-02"))

    val c4 = decompose(d("2020-03-30"), d("2020-09-30"))
    assert(c4.quarters == Seq(QuarterScan(2020, 2, All), QuarterScan(2020, 3, All)))
    assert(c4.days.map(_.toString) == Seq("2020-03-30", "2020-03-31"))
  }

  test("balancing-point edges: residual-filter quarterlies + end-day quirk") {
    val r = decompose(d("2020-01-06"), d("2020-11-05"))
    assert(r.quarters == Seq(
      QuarterScan(2020, 1, OnOrAfter(d("2020-01-06"))),
      QuarterScan(2020, 2, All), QuarterScan(2020, 3, All),
      QuarterScan(2020, 4, OnOrBefore(d("2020-11-05")))))
    // the reference emits BOTH the filtered quarterly and a daily scan for
    // the end date (combo.py:186-192 sets current_date = end_date)
    assert(r.days == Seq(d("2020-11-05")))
  }

  test("quarter math validation (utils.py:55-83)") {
    assertThrows[IllegalArgumentException](quarterStartMonth(0))
    assertThrows[IllegalArgumentException](quarterStartMonth(5))
    assertThrows[IllegalArgumentException](addQuarter(2020, 0))
    assert(addQuarter(2020, 4) == (2021, 1))
    assert(addQuarter(2020, 2) == (2020, 3))
    assert(quarterOf(d("2020-05-15")) == 2)
  }
}
