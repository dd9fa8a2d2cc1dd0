package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Time-series alignment: linear interpolation of an irregular series at
  * arbitrary probe timestamps — the "value of the metric at the moment
  * of the fact" lookup that turns event streams into model features
  * (sensor readings at label times, price at trade time, engagement
  * score at sampling time).
  *
  * Scale design (100 TB): the series and the probes are unioned and
  * sorted ONCE per key — a single hash-partition exchange on the key
  * plus one in-partition sort carries BOTH direction lookups (the
  * backward neighbor via a preceding-frame window, the forward neighbor
  * via a following-frame window over the same sort). No self-join, no
  * per-probe range scan, and the output is exactly one row per probe.
  * Compare the naive as-of-join-both-directions form: two sorts and two
  * joins of the full series against the probe set.
  *
  * Determinism: neighbors are exact (longs and ≤4-decimal doubles);
  * the interpolated double is ONE fixed IEEE association
  * `v0 + (v1-v0) * ((t-t0)/(t1-t0))`, so any ANSI engine reproduces it
  * bit-for-bit from the same inputs.
  */
object TimeSeries {

  /** Interpolate `valCol` of `series` at each row of `probes`.
    *
    * Output: the probe keys and timestamp plus `t0,v0` (latest series
    * point at-or-before the probe), `t1,v1` (earliest strictly-after
    * series point — at-equal timestamps the point lands in `t0`), and
    * `v_interp`:
    *   - both neighbors present: linear interpolation (exact `v0` when
    *     `t0 == probe_ts`, since the slope term is exactly zero);
    *   - probe before the first / after the last point: the nearest
    *     neighbor's value (constant extrapolation);
    *   - key with no series rows at all: null.
    *
    * Ties inside one series at the same timestamp break on value (then
    * arbitrary-but-deterministic by the total sort), so duplicate
    * timestamps cannot make the result run-dependent.
    *
    * @param series DataFrame with `keys`, `tsCol` (long — e.g. epoch
    *               µs), `valCol` (numeric)
    * @param probes DataFrame with `keys` and `tsCol`; other columns pass
    *               through
    */
  def interpolateAt(series: DataFrame, probes: DataFrame,
      keys: Seq[String], tsCol: String, valCol: String): DataFrame = {
    val passThrough = probes.columns.filterNot(c =>
      keys.contains(c) || c == tsCol)
    val sRows = series.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+ lit(0).as("__is_probe") :+
        col(valCol).cast(DoubleType).as("__v")) ++
        passThrough.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val pRows = probes.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+ lit(1).as("__is_probe") :+
        lit(null).cast(DoubleType).as("__v")) ++ passThrough.map(col): _*)
    // one exchange + one sort serves both frames; the value tiebreaker
    // keeps duplicate-timestamp series rows deterministic
    val order = Seq(col("__ts"), col("__is_probe"),
      coalesce(col("__v"), lit(0.0)))
    val back = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val sTs = when(col("__is_probe") === 0, col("__ts"))
    val sV = when(col("__is_probe") === 0, col("__v"))
    sRows.unionByName(pRows)
      .withColumn("t0", last(sTs, ignoreNulls = true).over(back))
      .withColumn("v0", last(sV, ignoreNulls = true).over(back))
      .withColumn("t1", first(sTs, ignoreNulls = true).over(fwd))
      .withColumn("v1", first(sV, ignoreNulls = true).over(fwd))
      .filter(col("__is_probe") === 1)
      .withColumn("v_interp",
        when(col("t0").isNull, col("v1"))
          .when(col("t1").isNull, col("v0"))
          .otherwise(col("v0") + (col("v1") - col("v0")) *
            ((col("__ts") - col("t0")).cast(DoubleType) /
              (col("t1") - col("t0")).cast(DoubleType))))
      .select((keys.map(col) :+ col("__ts").as(tsCol)) ++
        passThrough.map(col) ++
        Seq(col("t0"), col("v0"), col("t1"), col("v1"), col("v_interp")): _*)
  }
}
