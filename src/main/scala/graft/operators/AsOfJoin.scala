package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, the single latest right row with
  * `right.ts <= left.ts` within the same key — the event-attribution /
  * point-in-time-lookup join (DuckDB/kdb `ASOF JOIN`, pandas
  * `merge_asof`) that Spark has no built-in operator for.
  *
  * Formulation (SURVEY §2 custom-operator preference (a): compose
  * existing ops): tag and union the two sides, then one window per key
  * ordered by (ts, side) takes the running `last` of each right payload
  * column with `ignoreNulls` — right rows sort BEFORE left rows at equal
  * ts, so ties match (>= semantics). This is ONE shuffle on the key
  * columns and a per-partition sort: no range cross-join, no per-row
  * probing, no skew amplification beyond the key distribution itself —
  * the shape that survives 100 TB. (A broadcast-able right side can also
  * go through a plain join + per-key top-1, but that explodes on range
  * overlap; the union-window form is output-linear.)
  *
  * @param keyCols     equality keys (e.g. user id).
  * @param tsCol       ordering column, present on both sides (numeric or
  *                    timestamp; name must match).
  * @param rightPrefix prefix for the right side's payload columns in the
  *                    output (they arrive nullable — unmatched lefts get
  *                    nulls, like a left outer join).
  * @param tolerance   optional max `left.ts - right.ts` (same unit as
  *                    `tsCol`); matches farther back are nulled out,
  *                    mirroring `merge_asof(tolerance=...)`.
  */
object AsOfJoin {

  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightPrefix: String = "r_",
      tolerance: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoin needs at least one key column")
    val leftPayload = left.columns.filterNot(c =>
      keyCols.contains(c) || c == tsCol)
    val rightPayload = right.columns.filterNot(c =>
      keyCols.contains(c) || c == tsCol)
    val prefixed = rightPayload.map(rightPrefix + _)
    val collisions = prefixed.toSet intersect leftPayload.toSet
    require(collisions.isEmpty,
      s"right payload collides with left columns: ${collisions.mkString(",")}")

    // common shape: keys ++ ts ++ left payload ++ prefixed right payload
    val lTagged = left.select(
      (keyCols.map(col) :+ col(tsCol)) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType)
          .as(rightPrefix + c)) :+ lit(1).as("__side"): _*)
    val rTagged = right.select(
      (keyCols.map(col) :+ col(tsCol)) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(rightPrefix + c)) :+
        lit(0).as("__side"): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedTs = last(when(col("__side") === 0, col(tsCol)), true).over(w)
    val withMatches = lTagged.unionByName(rTagged)
      .withColumn("__r_ts", matchedTs)
      .select(col("*") +: prefixed.map(c =>
        last(col(c), ignoreNulls = true).over(w).as(s"__m_$c")): _*)
      .filter(col("__side") === 1)

    // tolerance: a match farther back than allowed is no match at all
    val within: Column = tolerance
      .map(t => col("__r_ts").isNotNull && col(tsCol) - col("__r_ts") <= t)
      .getOrElse(col("__r_ts").isNotNull)
    withMatches.select(
      (keyCols.map(col) :+ col(tsCol)) ++
        leftPayload.map(col) ++
        prefixed.map(c => when(within, col(s"__m_$c")).as(c)) :+
        when(within, col("__r_ts")).as(rightPrefix + tsCol): _*)
  }
}
