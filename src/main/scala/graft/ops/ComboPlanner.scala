package graft.ops

import java.time.LocalDate
import java.time.temporal.ChronoUnit

/** The reference's only "planner": decompose a [start, end] date range into
  * quarterly index scans (with residual date filters) and per-day daily
  * scans, switching on `balancingPoint` (`core/combo.py:137-199`).
  *
  * In the Spark engine the *analytic* tier gets this for free — data laid
  * out `partitionBy(year, quarter, date)` is pruned by Catalyst
  * (`PruneFileSourcePartitions`) from the `date_filed between` predicate.
  * This planner only matters for the remote-*fetch* tier, deciding which
  * index artifacts to pull, so it is a plain Scala function on the driver:
  * its output is O(quarters), never data-sized.
  */
object ComboPlanner {

  /** Residual filter a quarterly scan carries (`combo.py:164-192`). */
  sealed trait DateFilter
  case object All extends DateFilter
  final case class OnOrAfter(d: LocalDate) extends DateFilter
  final case class OnOrBefore(d: LocalDate) extends DateFilter

  final case class QuarterScan(year: Int, quarter: Int, filter: DateFilter)
  final case class Decomposition(quarters: Seq[QuarterScan], days: Seq[LocalDate])

  /** `get_quarter` (`utils.py:46-52`). */
  def quarterOf(d: LocalDate): Int = (d.getMonthValue - 1) / 3 + 1

  /** `get_month` (`utils.py:55-66`). */
  def quarterStartMonth(q: Int): Int = {
    require(q >= 1 && q <= 4, "Quarter must be between 1 and 4.")
    1 + (q - 1) * 3
  }

  /** `add_quarter` (`utils.py:69-83`). */
  def addQuarter(year: Int, quarter: Int): (Int, Int) = {
    require(quarter >= 1 && quarter <= 4, "Quarter must be between 1 and 4.")
    if (quarter == 4) (year + 1, 1) else (year, quarter + 1)
  }

  /** `fill_days` (`core/combo.py:12-28`). */
  def fillDays(start: LocalDate, end: LocalDate,
      includeStart: Boolean = false, includeEnd: Boolean = false): Seq[LocalDate] = {
    val startRange = if (includeStart) 0L else 1L
    val endRange = ChronoUnit.DAYS.between(start, end) + (if (includeEnd) 1L else 0L)
    (startRange until endRange).map(start.plusDays)
  }

  /** Faithful port of `_get_quarterly_daily_date_lists`
    * (`core/combo.py:137-199`), including its end-edge behavior: a
    * right-truncated quarter longer than the balancing point emits a
    * quarterly scan filtered `<= end` AND a daily scan for the end date
    * itself (the reference sets `current_date = end_date` rather than the
    * next quarter start, so the loop runs once more).
    */
  def decompose(startDate: LocalDate, endDate: LocalDate,
      balancingPoint: Int = 30): Decomposition = {
    val quarters = Seq.newBuilder[QuarterScan]
    val days = Seq.newBuilder[LocalDate]
    var current = startDate
    var done = false
    while (!done && !current.isAfter(endDate)) {
      val q = quarterOf(current)
      val y = current.getYear
      val (ny, nq) = addQuarter(y, q)
      val nextQuarterStart = LocalDate.of(ny, quarterStartMonth(nq), 1)
      val daysTillNextQuarter = ChronoUnit.DAYS.between(current, nextQuarterStart)
      val daysTillEnd = ChronoUnit.DAYS.between(current, endDate)
      if (daysTillNextQuarter <= daysTillEnd) {
        val quarterStart = LocalDate.of(y, quarterStartMonth(q), 1)
        if (quarterStart == current) {
          quarters += QuarterScan(y, q, All)
          current = nextQuarterStart
        } else if (daysTillNextQuarter > balancingPoint) {
          quarters += QuarterScan(y, q, OnOrAfter(startDate))
          current = nextQuarterStart
        } else {
          days ++= fillDays(current, nextQuarterStart,
            includeStart = true, includeEnd = false)
          current = nextQuarterStart
        }
      } else {
        if (daysTillEnd > balancingPoint) {
          if (daysTillNextQuarter - 1 == daysTillEnd) {
            quarters += QuarterScan(y, q, All)
            current = nextQuarterStart
          } else {
            quarters += QuarterScan(y, q, OnOrBefore(endDate))
            current = endDate
          }
        } else {
          days ++= fillDays(current, endDate,
            includeStart = true, includeEnd = true)
          done = true
        }
      }
    }
    Decomposition(quarters.result(), days.result())
  }

  /** Whether a quarterly scan (with its residual filter) covers `day`. */
  def quarterCovers(q: QuarterScan, day: LocalDate): Boolean =
    day.getYear == q.year && quarterOf(day) == q.quarter && (q.filter match {
      case All => true
      case OnOrAfter(s) => !day.isBefore(s)
      case OnOrBefore(e) => !day.isAfter(e)
    })

  /** Daily scans not already covered by a quarterly scan. The reference's
    * end-edge quirk (`combo.py:186-192`: `current_date = end_date` makes
    * the loop emit a `<= end` quarterly AND a daily scan for the end day)
    * double-fetches that day — masked in the reference only because the
    * filesystem sink overwrites the same path. The union tier prunes the
    * redundant daily scan instead.
    */
  def uncoveredDays(d: Decomposition): Seq[LocalDate] =
    d.days.filterNot(day => d.quarters.exists(q => quarterCovers(q, day)))
}
