package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cohort-retention and funnel analysis — the two event-analytics
  * shapes every product/telemetry warehouse runs beside sessionization
  * (reference analog: the daily-index polling cadence,
  * `secedgar/core/daily.py`). Both are exact-integer pipelines (day
  * numbers via integral division of epoch microseconds, counts, strict
  * event-time ordering), so both faces are DuckDB-oracle-checkable
  * bit-for-bit.
  */
object EventAnalytics {

  private val UsPerDay = 86400000000L

  /** Floored epoch bucket `x floorDiv b` as a SQL fragment. Spark `div`
    * truncates toward zero, so pre-1970 (negative) timestamps would
    * collide bucket −0 with 0 and shift every negative bucket by one;
    * subtracting the non-negative `pmod` remainder first makes the
    * numerator exactly divisible, where truncating and flooring division
    * agree — one codegen'd expression, engine-definition-independent.
    */
  private def floorBucket(x: String, b: Long): String =
    s"($x - pmod($x, ${b}L)) div ${b}L"

  /** Cohort retention matrix: cohort a user by their FIRST event day,
    * then count distinct users of each cohort active again `day_offset`
    * days later: `(cohort_day, day_offset, n_users)`, offset 0 = the
    * cohort's own size. Day = epoch_us div 86400e6 — integral, DST-free.
    *
    * Two shuffles total, both on bounded keys: one groupBy(user) for
    * the cohort assignment (broadcast back — the per-user row is one
    * long), one groupBy(cohort, offset) over user-days. No window, no
    * self-join; at 100 TB the user-day distinct is the only wide
    * aggregation and it carries 16-byte rows.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val days = events.select(col(userCol).as("user"),
      col(tsCol).cast(LongType).as("us"))
      .select(col("user"), expr(floorBucket("us", UsPerDay)).as("day"))
    val cohorts = days.groupBy(col("user"))
      .agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq("user"))
      .select(col("user"), col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Strict-order funnel: the earliest completion chain of `steps` per
    * user — `t_i = min ts of step_i STRICTLY AFTER t_{i-1}` — emitting
    * `(user, depth, t_1 … t_k)` with nulls past the reached depth.
    * Unordered occurrences don't count (a purchase before the first
    * view is not a converted funnel), which is exactly what the naive
    * per-step `min(ts)` gets wrong.
    *
    * ONE scan of the event log, ONE shuffle: all users survive the
    * `groupBy(user)` while only step events survive into the per-user
    * sorted array (`collect_list` skips the null struct non-step events
    * map to), then a linear left-to-right fold over ascending `(us,
    * step)` assigns each `t_i` at the first step-i event strictly after
    * the already-fixed `t_{i-1}` — which IS the sequential min-chain,
    * since `t_{i-1}` never moves once set and ascending order makes the
    * first qualifying event the minimum. Per-user state is k longs; the
    * collected array is bounded by the user's step-event count. The
    * k-scans-of-the-fact-table formulation this replaces is kept as
    * [[funnelChained]] (it mirrors the SQL oracle's shape; a spec pins
    * the two bitwise-equal).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8,
      s"steps must be 1..8, got ${steps.size}")
    val k = steps.size
    val si = steps.zipWithIndex.foldLeft(
      lit(null).cast(org.apache.spark.sql.types.IntegerType)) {
      case (acc, (step, i)) =>
        when(col("et") === step, lit(i + 1)).otherwise(acc)
    }
    val evs = events.select(col(userCol).as("user"),
      col(tsCol).cast(LongType).as("us"), col(typeCol).as("et"))
      .withColumn("si", si)
      .groupBy(col("user"))
      .agg(sort_array(collect_list(when(col("si").isNotNull &&
        col("us").isNotNull, struct(col("us"), col("si"))))).as("evs"))
    val zero = struct((1 to k).map(i =>
      lit(null).cast(LongType).as(s"t_$i")): _*)
    val folded = aggregate(col("evs"), zero, (acc, x) =>
      struct((1 to k).map { i =>
        val prevOk =
          if (i == 1) lit(true)
          else acc.getField(s"t_${i - 1}").isNotNull &&
            x.getField("us") > acc.getField(s"t_${i - 1}")
        when(acc.getField(s"t_$i").isNotNull, acc.getField(s"t_$i"))
          .otherwise(when(x.getField("si") === i && prevOk,
            x.getField("us")))
          .as(s"t_$i")
      }: _*))
    evs.withColumn("__t", folded)
      .select((col("user") +: (1 to k).map(i =>
        col("__t").getField(s"t_$i").as(s"t_$i"))): _*)
      .withColumn("depth",
        steps.indices.foldLeft(lit(0L)) { (d, i) =>
          when(col(s"t_${i + 1}").isNotNull, lit((i + 1).toLong))
            .otherwise(d)
        })
      .select((col("user") +: col("depth") +:
        steps.indices.map(i => col(s"t_${i + 1}"))): _*)
  }

  /** The per-step join-chain funnel — k filtered `groupBy(user)` passes
    * over the event log, each joining back to the prior depth. Same
    * semantics as [[funnel]] (a spec pins them bitwise-equal) and the
    * same shape as the SQL oracle's step CTEs, but it scans the fact
    * table k+1 times — kept as the oracle-parity face and as the
    * cross-check, NOT the plan to run at 100 TB.
    */
  def funnelChained(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8,
      s"steps must be 1..8, got ${steps.size}")
    val base = events.select(col(userCol).as("user"),
      col(tsCol).cast(LongType).as("us"), col(typeCol).as("et"))
    val users = base.select(col("user")).distinct()
    val chain = steps.zipWithIndex.foldLeft(users) {
      case (acc, (step, i)) =>
        val prev = if (i == 0) lit(Long.MinValue) else col(s"t_$i")
        val stepMin = base.filter(col("et") === step)
          .join(acc.select((col("user") +: (1 to i).map(j =>
            col(s"t_$j"))): _*), Seq("user"))
          .filter(col("us") > prev)
          .groupBy(col("user"))
          .agg(min(col("us")).as(s"t_${i + 1}"))
        acc.join(stepMin, Seq("user"), "left")
    }
    chain.withColumn("depth",
      steps.indices.foldLeft(lit(0L)) { (d, i) =>
        when(col(s"t_${i + 1}").isNotNull, lit((i + 1).toLong)).otherwise(d)
      })
      .select((col("user") +: col("depth") +:
        steps.indices.map(i => col(s"t_${i + 1}"))): _*)
  }

  /** Per-type burstiness (Fano factor) of event arrivals over fixed
    * time buckets: with T buckets spanning the GLOBAL observed range
    * (empty buckets count as zero — that's where burstiness lives) and
    * per-bucket counts c_t,
    * {{{
    *   fano = Var(c)/Mean(c) = (T·Σc² − (Σc)²) / (T·Σc)
    * }}}
    * 1 ≈ Poisson arrivals, > 1 bursty, < 1 regular — the stream-health
    * check run before sizing streaming state stores. Entirely
    * exact-integer evidence plus ONE IEEE division; one
    * map-side-combined (type, bucket) count pass, everything after on
    * the tiny profile.
    *
    * Output: `(event_type, n_events, t_span, sum_sq, fano_num,
    * fano_den, fano)`.
    */
  def burstiness(events: DataFrame, typeCol: String, tsCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val buckets = events
      .select(col(typeCol).as("event_type"),
        col(tsCol).cast(LongType).as("__us"))
      .selectExpr("event_type", s"${floorBucket("__us", bucketUs)} as t")
      .groupBy(col("event_type"), col("t"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // types × buckets profile, one raw pass
    val span = buckets.agg(
      (max(col("t")) - min(col("t")) + lit(1L)).as("t_span"))
    buckets.groupBy(col("event_type"))
      .agg(sum(col("c")).as("n_events"),
        sum(col("c") * col("c")).as("sum_sq"))
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("n_events"), col("t_span"),
        col("sum_sq"),
        (col("t_span") * col("sum_sq") - col("n_events") * col("n_events"))
          .as("fano_num"),
        (col("t_span") * col("n_events")).as("fano_den"),
        ((col("t_span") * col("sum_sq") -
          col("n_events") * col("n_events")).cast(
            org.apache.spark.sql.types.DoubleType) /
          (col("t_span") * col("n_events")).cast(
            org.apache.spark.sql.types.DoubleType)).as("fano"))
  }

  /** LAST-TOUCH attribution: each conversion event credits the most
    * recent touch event by the same user STRICTLY before it (ties at
    * the same timestamp break on the `idCol` tiebreaker, same total
    * order as [[transitionMatrix]]), optionally within a lookback
    * window — the attribution shape behind every "which campaign gets
    * this purchase" report, and the join-free complement of [[funnel]].
    *
    * ONE window pass over the user's merged touch+conversion stream:
    * `last(touch, ignoreNulls)` over `rowsBetween(unboundedPreceding,
    * -1)` picks the latest preceding touch without a self-join or a
    * per-conversion scan; the lookback filter is a residual predicate.
    * Conversions with no (in-window) preceding touch surface with null
    * touch columns — unattributed conversions are data, not dropped
    * rows.
    *
    * Output: `(user, conv_id, conv_us, touch_id, touch_type, touch_us,
    * lag_us)`, one row per conversion event.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      touchTypes: Seq[String], convType: String,
      lookbackUs: Option[Long] = None): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      s"convType $convType cannot also be a touch type")
    lookbackUs.foreach(w => require(w > 0, s"lookbackUs must be > 0, got $w"))
    // within one timestamp, conversions sort BEFORE touches (__tk), so
    // the rows-frame ending at -1 can never hand a conversion a
    // same-instant touch, while every strictly-earlier touch — including
    // an earlier one behind a same-us touch — stays in the frame; eid
    // keeps the order (and thus the winning touch among equal
    // timestamps) total and deterministic
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user").orderBy(col("us"), col("__tk"), col("eid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val base = events
      .select(col(userCol).as("user"), col(tsCol).cast(LongType).as("us"),
        col(idCol).as("eid"), col(typeCol).as("et"))
      .filter(col("et").isin((convType +: touchTypes): _*))
      .withColumn("__tk", when(col("et") === convType, lit(0)).otherwise(lit(1)))
    val attributed = base
      .withColumn("__touch", last(
        when(col("__tk") === 1, struct(col("us"), col("eid"), col("et"))),
        ignoreNulls = true).over(w))
      .filter(col("et") === convType)
    val windowed = lookbackUs match {
      case Some(lb) => attributed.withColumn("__touch",
        when(col("us") - col("__touch.us") <= lb, col("__touch")))
      case None => attributed
    }
    windowed.select(col("user"), col("eid").as("conv_id"),
      col("us").as("conv_us"), col("__touch.eid").as("touch_id"),
      col("__touch.et").as("touch_type"), col("__touch.us").as("touch_us"),
      (col("us") - col("__touch.us")).as("lag_us"))
  }

  /** LINEAR (multi-touch) attribution: every touch strictly before a
    * conversion within the lookback window shares its credit equally —
    * `credit_ppm = 1 000 000 div n_touches`, exact integers, one row
    * per (conversion, touch) pair plus a null-touch row for
    * unattributed conversions. The equal-credit complement of
    * [[lastTouchAttribution]]'s winner-takes-all.
    *
    * Scale shape: the conv×touch pairing is a BUCKETIZED interval join
    * (the `q_range_join` recipe) — conversions explode into their
    * lookback bucket and its predecessor, equi-join on `(user,
    * bucket)`, residual time predicate — never a per-user nested loop;
    * `n_touches` rides a window over the (bounded: touches within one
    * lookback) per-conversion group.
    *
    * Output: `(user, conv_id, conv_us, touch_id, touch_type, touch_us,
    * n_touches, credit_ppm)`.
    */
  def linearAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      touchTypes: Seq[String], convType: String,
      lookbackUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      s"convType $convType cannot also be a touch type")
    require(lookbackUs > 0, s"lookbackUs must be > 0, got $lookbackUs")
    val base = events
      .select(col(userCol).as("user"), col(tsCol).cast(LongType).as("us"),
        col(idCol).as("eid"), col(typeCol).as("et"))
    def bucket(c: String) =
      expr(s"($c - pmod($c, ${lookbackUs}L)) div ${lookbackUs}L")
    val convs = base.filter(col("et") === convType)
      .select(col("user"), col("eid").as("conv_id"), col("us").as("conv_us"))
    val touches = base.filter(col("et").isin(touchTypes: _*))
      .select(col("user"), col("eid").as("touch_id"),
        col("et").as("touch_type"), col("us").as("touch_us"))
      .withColumn("__jb", bucket("touch_us"))
    val matched = convs
      .withColumn("__b", bucket("conv_us"))
      .withColumn("__jb", explode(array(col("__b"), col("__b") - 1)))
      .join(touches, Seq("user", "__jb"))
      .filter(col("touch_us") < col("conv_us") &&
        col("conv_us") - col("touch_us") <= lookbackUs)
      .select(col("user"), col("conv_id"), col("conv_us"), col("touch_id"),
        col("touch_type"), col("touch_us"))
    // one null-touch MARKER row per conversion rides the same window
    // frame, so unattributed conversions fall out of the count(touch)
    // directly — no anti-join, no re-execution of the pair subtree
    val markers = convs.select(col("user"), col("conv_id"), col("conv_us"),
      lit(null).cast(touches.schema("touch_id").dataType).as("touch_id"),
      lit(null).cast(org.apache.spark.sql.types.StringType)
        .as("touch_type"),
      lit(null).cast(LongType).as("touch_us"))
    matched.unionByName(markers)
      .withColumn("n_touches", count(col("touch_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("conv_id")))
      .filter(col("touch_id").isNotNull || col("n_touches") === 0L)
      .withColumn("credit_ppm",
        when(col("n_touches") > 0L, expr("1000000L div n_touches"))
          .cast(LongType))
  }

  /** First-order Markov transition matrix over per-user event streams:
    * each user's events in strict `(ts, id)` order form consecutive
    * `(from_type, to_type)` pairs, aggregated corpus-wide to counts and
    * row-normalized probabilities — the next-event model behind
    * session simulation and anomaly scoring.
    *
    * `idCol` must be a per-event unique tiebreaker so the ordering
    * (and therefore every count) is total and deterministic. `p` is
    * ONE exact IEEE division of two counts, so the face hash-compares.
    * Shuffle shape: one per-user window sort (the only full-stream
    * pass), one map-side-combined pair count; the `n_from` normalizer
    * is a broadcast-sized type×type table joined back.
    *
    * Output: `(from_type, to_type, n, n_from, p)`.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user").orderBy("us", "eid")
    val pairs = events
      .select(col(userCol).as("user"), col(tsCol).cast(LongType).as("us"),
        col(idCol).as("eid"), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    // n_from via a window over the tiny type×type count table — a
    // groupBy + self-join would recompute the full-stream pair subtree
    pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_from")).as("p"))
  }
}
