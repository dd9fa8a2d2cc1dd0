package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Event sessionization and interval (range) joins — the two remaining
  * event-time shapes a training/analytics pipeline needs beside
  * [[AsOfJoin]]. Both are exact-integer and oracle-checkable.
  */
object Sessionize {

  /** Assign per-key session sequence numbers: a new session starts at
    * the first event and wherever the gap to the previous event exceeds
    * `gap` (same unit as `tsCol`). One shuffle on the key, one
    * per-partition sort shared by the lag and the running sum — the
    * classic formulation, linear at any scale.
    *
    * Output: input columns + `session_seq` (1-based per key).
    */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
      gap: Long): DataFrame = {
    require(keyCols.nonEmpty && gap > 0)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val brk = when(prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(brk).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).cast(LongType))
  }

  /** Interval join: pairs where `right.ts ∈ [left.ts + lo, left.ts + hi]`
    * within the same key — bucketized so it never degenerates into a
    * per-key cross join. With bucket width `W = hi - lo`, a left row's
    * window spans at most TWO buckets, so the left side replicates ≤2×
    * into (key, bucket) and the join is a plain equi-join plus an exact
    * range filter: output-linear, one shuffle per side, skew bounded by
    * the key distribution. (A naive `ON key AND ts BETWEEN …` makes
    * Spark fall back to a per-key nested loop.)
    *
    * Right payload columns are prefixed; inner-join semantics (only
    * matching pairs).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, lo: Long, hi: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(hi >= lo, s"empty interval [$lo, $hi]")
    val w = math.max(hi - lo, 1L)
    // exact long floor division, sign-correct via pmod + integer DIV:
    // a double `floor(x / w)` would silently misbucket past 2^53
    // (e.g. nanosecond timestamps)
    def fdiv(tmp: String) = expr(s"($tmp - pmod($tmp, ${w}L)) div ${w}L")
    val leftB = left
      .withColumn("__tlo", col(tsCol).cast(LongType) + lo)
      .withColumn("__thi", col(tsCol).cast(LongType) + hi)
      .withColumn("__b",
        explode(array_distinct(array(fdiv("__tlo"), fdiv("__thi")))))
      .drop("__tlo", "__thi")
    val rightSel = right
      .withColumn("__t", col(tsCol).cast(LongType))
      .select(
        (keyCols.map(col) :+
          fdiv("__t").as("__b") :+
          col(tsCol).as(rightPrefix + tsCol)) ++
          right.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
            .map(c => col(c).as(rightPrefix + c)): _*)
    leftB.join(rightSel, keyCols :+ "__b")
      .filter(col(rightPrefix + tsCol).between(
        col(tsCol) + lo, col(tsCol) + hi))
      .drop("__b")
  }
}
