package graft.ops

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.scalatest.funsuite.AnyFunSuite

/** Property-style coverage check for the combo decomposition
  * (`combo.py:137-199`) over 500 seeded random (start, end,
  * balancing_point) inputs.
  *
  * Two tiers are checked:
  *   - the faithful planner output, allowing the reference's own edges:
  *     the end day may be double-covered (`combo.py:186-192` emits a
  *     `<= end` quarterly AND a daily scan for the end day), and a range
  *     whose start and end share a quarter may leak pre-start days (the
  *     same branch carries no `>= start` bound);
  *   - the union tier's effective coverage
  *     ([[ComboPlanner.uncoveredDays]] pruning + the [start, end]
  *     residual clip in `Filings.ComboQuery.entries`), which must cover
  *     every in-range day EXACTLY once and nothing else.
  */
class ComboPlannerPropSpec extends AnyFunSuite {

  private def quarterDays(y: Int, q: Int): Seq[LocalDate] = {
    val s = LocalDate.of(y, ComboPlanner.quarterStartMonth(q), 1)
    val e = s.plusMonths(3)
    Iterator.iterate(s)(_.plusDays(1)).takeWhile(_.isBefore(e)).toSeq
  }

  private def coverage(d: ComboPlanner.Decomposition,
      days: Seq[LocalDate]): Map[LocalDate, Int] = {
    val counts = scala.collection.mutable.Map
      .empty[LocalDate, Int].withDefaultValue(0)
    d.quarters.foreach { qs =>
      quarterDays(qs.year, qs.quarter)
        .filter(day => ComboPlanner.quarterCovers(qs, day))
        .foreach(day => counts(day) += 1)
    }
    days.foreach(day => counts(day) += 1)
    counts.toMap.withDefaultValue(0)
  }

  test("500 seeded random ranges: planner output covers every in-range " +
    "day (reference edges allowed); pruned+clipped union tier covers " +
    "each exactly once") {
    val rnd = new scala.util.Random(20260812L)
    for (_ <- 1 to 500) {
      val start = LocalDate.of(1994, 1, 1).plusDays(rnd.nextInt(4000))
      val end = start.plusDays(rnd.nextInt(800))
      val bp = 1 + rnd.nextInt(90)
      val ctx = s"start=$start end=$end bp=$bp"
      val d = ComboPlanner.decompose(start, end, bp)
      val range = (0L to ChronoUnit.DAYS.between(start, end))
        .map(start.plusDays)

      // tier 1: faithful planner — every in-range day covered at least
      // once, at most twice (end-edge quirk), never more
      val raw = coverage(d, d.days)
      range.foreach { day =>
        assert(raw(day) >= 1, s"$ctx day $day uncovered")
        assert(raw(day) <= 2, s"$ctx day $day covered ${raw(day)} times")
      }

      // tier 2: union tier — pruned daily scans + range clip give exact
      // single coverage, nothing out of range
      val effective = coverage(d, ComboPlanner.uncoveredDays(d))
        .filter { case (day, _) => !day.isBefore(start) && !day.isAfter(end) }
        .withDefaultValue(0)
      range.foreach { day =>
        assert(effective(day) == 1,
          s"$ctx day $day effectively covered ${effective(day)} times")
      }
    }
  }
}
