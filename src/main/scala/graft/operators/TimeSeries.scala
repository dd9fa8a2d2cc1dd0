package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Time-series alignment: linear interpolation of an irregular series at
  * arbitrary probe timestamps — the "value of the metric at the moment
  * of the fact" lookup that turns event streams into model features
  * (sensor readings at label times, price at trade time, engagement
  * score at sampling time).
  *
  * Scale design (100 TB): the series and the probes are unioned and
  * hash-partitioned ONCE on the key; both direction lookups ride that
  * single exchange as two in-partition sorts (ascending and descending)
  * with a running `last()` over an UnboundedPreceding→CurrentRow frame
  * each. That frame is evaluated incrementally by Spark (one state
  * update per row, O(n log n) per partition with the sort); the naive
  * CurrentRow→UnboundedFollowing frame for the forward neighbor would
  * re-aggregate to the partition end for EVERY row — O(n²) on a hot
  * key — so the forward pass instead runs the same running frame over
  * the descending sort. No self-join, no per-probe range scan, and the
  * output is exactly one row per probe.
  *
  * Determinism: neighbors are exact (longs and ≤4-decimal doubles);
  * the interpolated double is ONE fixed IEEE association
  * `v0 + (v1-v0) * ((t-t0)/(t1-t0))`, so any ANSI engine reproduces it
  * bit-for-bit from the same inputs.
  */
object TimeSeries {

  /** Column names the operator writes; probe pass-through (and key)
    * columns must not collide with them.
    */
  private val Reserved = Set("t0", "v0", "t1", "v1", "v_interp",
    "__ts", "__is_probe", "__v", "__b", "__f")

  /** Output columns [[rollingStats]] writes. */
  private val RollingReserved =
    Set("n_window", "roll_sum", "roll_min", "roll_max", "roll_mean")

  /** Output columns [[ewma]] writes (beyond the grouping keys). */
  private val EwmaReserved = Set("n_points", "ewma", "__pts")

  private def requireNoClash(cols: Iterable[String], reserved: Set[String],
      op: String): Unit = {
    val clash = cols.toSet intersect reserved
    require(clash.isEmpty,
      s"input columns collide with $op outputs: " +
        s"${clash.toSeq.sorted.mkString(", ")} — rename them first")
  }

  /** Bounded trailing-window features per key — the rolling context a
    * feature pipeline attaches to each event (last-N sum/mean/extremes):
    * one key exchange + one in-partition sort, a ROWS frame over the
    * trailing `nRows` events. A bounded ROWS frame is evaluated by
    * Spark's sliding frame (add one row, retract one row per step —
    * O(n) per partition), never the O(n²) re-aggregating frames.
    *
    * `orderCols` must totally order rows within a key (include a unique
    * tiebreaker) or frame membership is run-dependent. Sums ride
    * DECIMAL(18,4) — exact and order-free for the ≤4-decimal measures
    * this engine standardizes on (see [[graft.queries.Q]]) — and
    * surface as doubles; `roll_mean` is one exact IEEE division. Every
    * output column is oracle-exact (`q_rolling`), not approximate.
    */
  def rollingStats(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      valCol: String, nRows: Int): DataFrame = {
    require(keys.nonEmpty, "rollingStats needs at least one key column")
    require(orderCols.nonEmpty,
      "rollingStats needs ordering columns (with a unique tiebreaker)")
    require(nRows >= 1, s"nRows must be positive, got $nRows")
    requireNoClash(df.columns, RollingReserved, "rollingStats")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(nRows - 1L), Window.currentRow)
    df.withColumn("n_window", count(lit(1)).over(w).cast(LongType))
      .withColumn("roll_sum",
        sum(col(valCol).cast(DecimalType(18, 4))).over(w).cast(DoubleType))
      .withColumn("roll_min", min(col(valCol)).over(w))
      .withColumn("roll_max", max(col(valCol)).over(w))
      .withColumn("roll_mean",
        col("roll_sum") / col("n_window").cast(DoubleType))
  }

  /** Per-key exponentially-weighted moving average — the decay feature a
    * training pipeline attaches to each entity ("current engagement",
    * "recent quality"): EWMA₁ = v₁, EWMAᵢ = α·vᵢ + (1−α)·EWMAᵢ₋₁ over
    * the key's events in (ts, value) order.
    *
    * A sequential recurrence is inherently serial PER KEY; parallelism
    * comes from keys, so the shape is ONE groupBy:
    * `sort_array(collect_list(struct(ts, v)))` then a codegen'd
    * `aggregate` left fold seeded by the first element. Per-key state is
    * the key's own event list — bounded by per-key cardinality, the same
    * contract as the batch sessionizer's sorted key history (keys with
    * unbounded histories belong on the streaming tier, where the EWMA is
    * one double of running state per key).
    *
    * Determinism: the fold's IEEE association (`α·v + (1−α)·acc`, first
    * element as seed) is exactly DuckDB's `list_reduce`, so the float
    * output is oracle-checked bit-for-bit (`q_ewma`), not pinned. Rows
    * with a null value are dropped up front (same contract as
    * [[interpolateAt]]).
    */
  def ewma(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, alpha: Double): DataFrame = {
    require(keys.nonEmpty, "ewma needs at least one key column")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    requireNoClash(keys, EwmaReserved, "ewma")
    df.filter(col(valCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_points"),
        sort_array(collect_list(struct(col(tsCol).as("t"),
          col(valCol).cast(DoubleType).as("v")))).as("__pts"))
      .withColumn("ewma", expr(
        s"aggregate(slice(__pts, 2, size(__pts) - 1), __pts[0].v, " +
          s"(acc, x) -> $alpha * x.v + (1.0 - $alpha) * acc)"))
      .drop("__pts")
  }

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
    * Series rows with a null `valCol` are dropped up front: a null
    * measurement carries no interpolatable value, and keeping it would
    * force a choice between a mismatched (t0 from the null row, v0 from
    * an older one) and a null-poisoned pair. The (t0,v0) and (t1,v1)
    * pairs are each extracted from ONE struct aggregate, so they always
    * come from the same series row by construction.
    *
    * Ties inside one series at the same timestamp break on value (then
    * arbitrary-but-deterministic by the total sort), so duplicate
    * timestamps cannot make the result run-dependent.
    *
    * @param series DataFrame with `keys`, `tsCol` (long — e.g. epoch
    *               µs), `valCol` (numeric)
    * @param probes DataFrame with `keys` and `tsCol`; other columns pass
    *               through and must not be named t0/v0/t1/v1/v_interp
    *               (or an internal `__`-prefixed working name)
    */
  def interpolateAt(series: DataFrame, probes: DataFrame,
      keys: Seq[String], tsCol: String, valCol: String): DataFrame = {
    require(keys.nonEmpty, "interpolateAt needs at least one key column")
    val passThrough = probes.columns.filterNot(c =>
      keys.contains(c) || c == tsCol)
    val clash = (passThrough.toSet ++ keys) intersect Reserved
    require(clash.isEmpty,
      s"probe/key columns collide with interpolateAt outputs: " +
        s"${clash.toSeq.sorted.mkString(", ")} — rename them first")
    val sRows = series.filter(col(valCol).isNotNull).select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+ lit(0).as("__is_probe") :+
        col(valCol).cast(DoubleType).as("__v")) ++
        passThrough.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val pRows = probes.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+ lit(1).as("__is_probe") :+
        lit(null).cast(DoubleType).as("__v")) ++ passThrough.map(col): _*)
    // one exchange serves both directions; the value tiebreaker keeps
    // duplicate-timestamp series rows deterministic. Both windows use
    // the incremental UnboundedPreceding running frame — the descending
    // sort turns "earliest strictly after" into "running last".
    val asc = Seq(col("__ts").asc, col("__is_probe").asc,
      coalesce(col("__v"), lit(0.0)).asc)
    val desc = Seq(col("__ts").desc, col("__is_probe").desc,
      coalesce(col("__v"), lit(0.0)).desc)
    val back = Window.partitionBy(keys.map(col): _*).orderBy(asc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keys.map(col): _*).orderBy(desc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one struct per direction: (t, v) can never pair across rows.
    // Equal-ts series rows sort before the probe ascending (is_probe 0<1)
    // and after it descending, so they are in the backward frame and out
    // of the forward one — "at-equal lands in t0" holds by the sort.
    val sPair = when(col("__is_probe") === 0,
      struct(col("__ts").as("t"), col("__v").as("v")))
    sRows.unionByName(pRows)
      .withColumn("__b", last(sPair, ignoreNulls = true).over(back))
      .withColumn("__f", last(sPair, ignoreNulls = true).over(fwd))
      .filter(col("__is_probe") === 1)
      .withColumn("t0", col("__b.t")).withColumn("v0", col("__b.v"))
      .withColumn("t1", col("__f.t")).withColumn("v1", col("__f.v"))
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

  /** Classical additive seasonal decomposition of a bucketed series —
    * the pipeline-health primitive ("is this drop an anomaly or just
    * Sunday?") run over event volumes/values before alerting on them.
    *
    *   - `x_t`: per-bucket exact DECIMAL(18,4) sum of `valueCol` (order
    *     free), emitted as double.
    *   - `trend_t`: centered 2×m moving average — the textbook
    *     even-period form, computed as
    *     `(Σ_{[t−m/2, t+m/2−1]} + Σ_{[t−m/2+1, t+m/2]}) / 2m` on exact
    *     decimal sums with ONE double division at the edge. Emitted
    *     only for interior buckets (full window present).
    *   - `seasonal_p` (p = t mod m): the phase-profile form — phase
    *     mean minus grand mean, each a `CAST(decimal AS DOUBLE)/count`
    *     with a fixed op order. (The detrended-mean form would average
    *     DOUBLES, whose sum order no relational engine pins; the
    *     phase-profile variant keeps every aggregation exact-decimal,
    *     which is what makes the face hash-checkable. For near-constant
    *     trend the two coincide.)
    *   - `remainder_t = x_t − trend_t − seasonal_p`: two subtractions
    *     in fixed order.
    *
    * Scale shape: one shuffle for the bucket aggregation (map-side
    * combined), one single-partitioning window pass over the BUCKETED
    * series (cardinality = time range / bucket, thousands — not the raw
    * events), one broadcastable phase-profile join. RANGE frames on the
    * integer bucket index tolerate gaps; a bucket only gets a trend
    * when all 2·(m/2)+1 neighbors exist.
    *
    * @param period  buckets per season (must be even — the 2×m form),
    *                e.g. 24 one-hour buckets for a daily cycle.
    */
  def seasonalDecompose(df: DataFrame, usCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column, bucketUs: Long,
      period: Int): DataFrame = {
    require(period >= 2 && period % 2 == 0,
      s"period must be even and >= 2 (the 2xm moving average), got $period")
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val half = period / 2
    // one row per bucket (time range / bucketUs — thousands, not the
    // raw events), eagerly checkpointed: three consumers below (trend
    // windows, phase profile, grand mean) must not each re-scan the
    // raw event table
    val buckets = df
      .withColumn("__us", usCol.cast(LongType))
      .withColumn("__v", valueCol.cast(DecimalType(18, 4)))
      .selectExpr(s"(__us - pmod(__us, ${bucketUs}L)) div ${bucketUs}L" +
        " as t", "__v")
      .groupBy(col("t"))
      .agg(sum(col("__v")).as("__xd"), count(lit(1)).as("n_events"))
      .localCheckpoint(true)
    val ord = Window.orderBy(col("t"))
    val left = ord.rangeBetween(-half, half - 1)
    val right = ord.rangeBetween(-half + 1, half)
    val full = ord.rangeBetween(-half, half)
    val withTrend = buckets
      .withColumn("__s1", sum(col("__xd")).over(left))
      .withColumn("__n1", count(lit(1)).over(left))
      .withColumn("__s2", sum(col("__xd")).over(right))
      .withColumn("__n2", count(lit(1)).over(right))
      .withColumn("__nf", count(lit(1)).over(full))
      .filter(col("__nf") === (period + 1) &&
        col("__n1") === period && col("__n2") === period)
      .withColumn("trend", (col("__s1") + col("__s2")).cast(DoubleType) /
        lit(2.0 * period))
    val phase = buckets
      .groupBy(pmod(col("t"), lit(period.toLong)).as("phase"))
      .agg(sum(col("__xd")).as("__ps"), count(lit(1)).as("__pn"))
    val grand = buckets.agg(sum(col("__xd")).as("__gs"),
      count(lit(1)).as("__gn"))
    withTrend
      .withColumn("phase", pmod(col("t"), lit(period.toLong)))
      .join(broadcast(phase), Seq("phase"))
      .crossJoin(broadcast(grand))
      .withColumn("x", col("__xd").cast(DoubleType))
      .withColumn("seasonal",
        col("__ps").cast(DoubleType) / col("__pn").cast(DoubleType) -
          col("__gs").cast(DoubleType) / col("__gn").cast(DoubleType))
      .withColumn("remainder",
        col("x") - col("trend") - col("seasonal"))
      .select(col("t"), col("phase"), col("n_events"), col("x"),
        col("trend"), col("seasonal"), col("remainder"))
  }

  /** Sample autocorrelation of the bucketed series at lags
    * `1..maxLag` — the diagnostic that puts a NUMBER on periodicity
    * before committing to a [[seasonalDecompose]] period:
    * {{{
    *   r_l = Σ_t (x_t − m)(x_{t+l} − m)  /  Σ_t (x_t − m)²
    * }}}
    * over the observed bucket sequence (lag in bucket units; a pair
    * contributes only when both endpoints exist, so gaps shrink
    * `n_pairs` rather than fabricating zeros; denominators span all
    * observed buckets — the standard n-denominator sample ACF). A
    * constant series (zero denominator) scores 0 by definition.
    *
    * Determinism: bucket sums are exact DECIMAL images of ≤4-decimal
    * values; the mean is one exact-decimal-to-double cast and one
    * division; numerator and denominator fold their double terms in
    * ascending-`t` order (the [[Drift.psiKl]] sorted-array pattern), so
    * any engine replays `acf` bit-for-bit — quantize to ppb at the
    * gate for the usual ulp margin. Bucket table is checkpointed: one
    * pass over the raw events, everything after touches
    * time-range/bucket rows only.
    *
    * Output: `(lag, n_pairs, n_buckets, acf)`.
    */
  def autocorrelation(df: DataFrame, usCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column, bucketUs: Long,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 1000,
      s"maxLag must be in [1,1000], got $maxLag")
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val buckets = df
      .withColumn("__us", usCol.cast(LongType))
      .withColumn("__v", valueCol.cast(DecimalType(18, 4)))
      .selectExpr(s"(__us - pmod(__us, ${bucketUs}L)) div ${bucketUs}L" +
        " as t", "__v")
      .groupBy(col("t"))
      .agg(sum(col("__v")).as("__xd"))
      .localCheckpoint(true) // one raw pass; bucket rows from here on
    val stats = buckets.agg(
      (sum(col("__xd")).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("__m"),
      count(lit(1)).as("n_buckets"))
    val dev = buckets.crossJoin(broadcast(stats))
      .select(col("t"),
        (col("__xd").cast(DoubleType) - col("__m")).as("d"),
        col("n_buckets"))
    val den = dev.agg(
      aggregate(
        sort_array(collect_list(struct(col("t"),
          (col("d") * col("d")).as("v")))),
        lit(0.0), (acc, x) => acc + x.getField("v")).as("__den"),
      max(col("n_buckets")).as("n_buckets"))
    dev.select(col("t"), col("d"))
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("t2", col("t") + col("lag"))
      .join(dev.select(col("t").as("t2"), col("d").as("d2")), Seq("t2"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        aggregate(
          sort_array(collect_list(struct(col("t"),
            (col("d") * col("d2")).as("v")))),
          lit(0.0), (acc, x) => acc + x.getField("v")).as("__num"))
      .crossJoin(broadcast(den))
      .select(col("lag").cast(LongType).as("lag"), col("n_pairs"),
        col("n_buckets"),
        when(col("__den") === 0.0, lit(0.0))
          .otherwise(col("__num") / col("__den")).as("acf"))
  }

  /** Sample cross-correlation between two bucketed series at lags
    * `-maxLag..maxLag` — the lead–lag diagnostic ("do purchases follow
    * views by ~2 hours?"):
    * {{{
    *   r_l = Σ_t (a_t − m_a)(b_{t+l} − m_b)
    *         / sqrt( Σ_t (a_t − m_a)² · Σ_t (b_t − m_b)² )
    * }}}
    * positive lag = `b` trails `a`. Same contract as
    * [[autocorrelation]]: observed-bucket pairs only, n-denominator
    * moments over all observed buckets of each series, a constant
    * series scores 0, t-ordered folds + exactly-rounded IEEE sqrt so
    * the ppb-quantized gate hash-compares.
    *
    * Inputs are pre-filtered frames of the SAME event table (or any
    * two frames with a µs column and a ≤4-decimal value column).
    * Output: `(lag, n_pairs, n_a, n_b, ccf)`.
    */
  def crossCorrelation(a: DataFrame, aUs: org.apache.spark.sql.Column,
      aVal: org.apache.spark.sql.Column, b: DataFrame,
      bUs: org.apache.spark.sql.Column, bVal: org.apache.spark.sql.Column,
      bucketUs: Long, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 1000,
      s"maxLag must be in [1,1000], got $maxLag")
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    def dev(df: DataFrame, us: org.apache.spark.sql.Column,
        v: org.apache.spark.sql.Column, nOut: String): DataFrame = {
      val buckets = df
        .withColumn("__us", us.cast(LongType))
        .withColumn("__v", v.cast(DecimalType(18, 4)))
        .selectExpr(s"(__us - pmod(__us, ${bucketUs}L)) div ${bucketUs}L" +
        " as t", "__v")
        .groupBy(col("t"))
        .agg(sum(col("__v")).as("__xd"))
        .localCheckpoint(true) // one raw pass per side
      val stats = buckets.agg(
        (sum(col("__xd")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("__m"),
        count(lit(1)).as(nOut))
      buckets.crossJoin(broadcast(stats))
        .select(col("t"),
          (col("__xd").cast(DoubleType) - col("__m")).as("d"), col(nOut))
    }
    def sq(df: DataFrame, out: String): DataFrame = df.agg(
      aggregate(
        sort_array(collect_list(struct(col("t"),
          (col("d") * col("d")).as("v")))),
        lit(0.0), (acc, x) => acc + x.getField("v")).as(out))
    val da = dev(a, aUs, aVal, "n_a")
    val db = dev(b, bUs, bVal, "n_b")
    val den = sq(da, "__da").crossJoin(sq(db, "__db"))
      .select(sqrt(col("__da") * col("__db")).as("__den"))
    val nA = da.agg(max(col("n_a")).as("n_a"))
    val nB = db.agg(max(col("n_b")).as("n_b"))
    da.select(col("t"), col("d"))
      .withColumn("lag", explode(sequence(lit(-maxLag), lit(maxLag))))
      .withColumn("t2", col("t") + col("lag"))
      .join(db.select(col("t").as("t2"), col("d").as("d2")), Seq("t2"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        aggregate(
          sort_array(collect_list(struct(col("t"),
            (col("d") * col("d2")).as("v")))),
          lit(0.0), (acc, x) => acc + x.getField("v")).as("__num"))
      .crossJoin(broadcast(den))
      .crossJoin(broadcast(nA))
      .crossJoin(broadcast(nB))
      .select(col("lag").cast(LongType).as("lag"), col("n_pairs"),
        col("n_a"), col("n_b"),
        when(col("__den") === 0.0, lit(0.0))
          .otherwise(col("__num") / col("__den")).as("ccf"))
  }
}
