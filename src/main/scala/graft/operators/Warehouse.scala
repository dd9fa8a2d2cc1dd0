package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: the dimension-history bookkeeping a
  * curation pipeline needs around its fact tables (provenance dims:
  * sources, licenses, crawl configs) — kept engine-native so history
  * rewrites are plain DataFrame jobs, not a storage-format feature.
  */
object Warehouse {

  /** SCD Type-2 merge: apply a batch of dimension updates to a versioned
    * history, closing out superseded versions and opening new ones.
    *
    * Contract:
    *   - `history` carries `keyCol`, `attrCols`, `fromCol`, `toCol`; a row
    *     is CURRENT iff `toCol` is null. At most one current row per key.
    *   - `updates` carries `keyCol`, `attrCols`, `tsCol` — the latest
    *     snapshot per key (callers fold intra-batch churn first, e.g. with
    *     a per-key argmax; two rows for one key here would open two
    *     overlapping versions).
    *   - A matched key whose attributes all compare equal (null-safe) is a
    *     no-op; a differing key closes the current row at the update's
    *     `tsCol` and opens a new version from it; an unmatched update key
    *     opens its first version. Closed history rows pass through.
    *
    * Scale design (100 TB dims): ONE full-outer shuffle join on the key —
    * change detection, closing, and inserts all derive from that single
    * exchange (the two output branches reuse it), and AQE broadcasts the
    * update side when it is small, making the merge read-dominated. No
    * window, no driver state.
    */
  def scd2Merge(history: DataFrame, updates: DataFrame, keyCol: String,
      attrCols: Seq[String], tsCol: String,
      fromCol: String = "valid_from", toCol: String = "valid_to"): DataFrame = {
    require(attrCols.nonEmpty, "scd2Merge: attrCols must be non-empty")
    val outCols = (keyCol +: attrCols) ++ Seq(fromCol, toCol)
    val toType = history.schema(toCol).dataType
    val cur = history.filter(col(toCol).isNull)
    val closed = history.filter(col(toCol).isNotNull)
      .select(outCols.map(col): _*)
    val u = updates.select(
      (col(keyCol).as("__k") +:
        attrCols.map(a => col(a).as(s"__u_$a"))) :+
        col(tsCol).as("__ts"): _*)
    val j = cur.join(u, col(keyCol) === col("__k"), "full_outer")
      .withColumn("__changed",
        attrCols.map(a => !(col(a) <=> col(s"__u_$a"))).reduce(_ || _))
      // one exchange feeds both output branches
      .localCheckpoint(false)
    // surviving current/closed rows: unchanged keys stay open, changed
    // keys close at the update timestamp
    val fromCur = j.filter(col(keyCol).isNotNull)
      .select((col(keyCol) +: attrCols.map(col)) ++ Seq(
        col(fromCol),
        when(col("__k").isNotNull && col("__changed"), col("__ts").cast(toType))
          .otherwise(col(toCol)).as(toCol)): _*)
    // opened versions: changed keys and first-seen keys
    val fromUpd = j.filter(col("__k").isNotNull &&
        (col(keyCol).isNull || col("__changed")))
      .select((col("__k").as(keyCol) +:
        attrCols.map(a => col(s"__u_$a").as(a))) ++ Seq(
        col("__ts").as(fromCol),
        lit(null).cast(toType).as(toCol)): _*)
    closed.unionByName(fromCur).unionByName(fromUpd)
  }

  /** The SCD2 READ face: join each fact row to the dimension version
    * that was valid at the fact's timestamp
    * (`valid_from ≤ ts ∧ (valid_to IS NULL ∨ ts < valid_to)`) — the
    * lookup every provenance-enriched fact scan runs. Facts with no
    * valid version at their ts (key unseen, or ts before its first
    * version) keep null dimension columns (left join).
    *
    * Scale design: dimensions are the SMALL side by definition —
    * `broadcast(history)` turns the temporal lookup into a map-side
    * hash join on the key with the interval predicate evaluated as a
    * post-join filter inside the same stage: zero shuffle of the fact
    * stream. (At most one version matches per fact by the SCD2
    * non-overlap invariant, so the join cannot fan out.) For a
    * dimension too large to broadcast, fall back to a shuffle join on
    * the key — the interval residual stays a cheap filter.
    */
  def versionAt(facts: DataFrame, history: DataFrame, keyCol: String,
      factTsCol: String, fromCol: String = "valid_from",
      toCol: String = "valid_to",
      broadcastDim: Boolean = true): DataFrame = {
    val dim = history.withColumnRenamed(keyCol, "__dk")
    val side = if (broadcastDim) broadcast(dim) else dim
    facts.join(side,
      col(keyCol) === col("__dk") &&
        col(fromCol) <= col(factTsCol) &&
        (col(toCol).isNull || col(factTsCol) < col(toCol)),
      "left")
      .drop("__dk")
  }

  /** Apply a change log (insert/update/delete events) to a snapshot:
    * last-writer-wins per key, then upsert/delete in one pass — the
    * MERGE INTO a curation pipeline runs to roll a corpus snapshot
    * forward from provenance events.
    *
    * Winner selection is `max(struct(ts, op, attrs...))` — a partial-
    * aggregable lexicographic argmax (no window sort), deterministic
    * even on duplicate `(key, ts)` pairs because the op and attributes
    * break the tie. Ops: `"d"` deletes the key; anything else upserts
    * the change's attributes. Keys absent from the log pass through.
    *
    * Scale design (100 TB): ONE map-side-combined aggregation over the
    * log (struct rows, no shuffle of the snapshot for winner selection)
    * + ONE full-outer key join against the snapshot; AQE broadcasts
    * small logs. Contrast with per-event application, which would be a
    * shuffle per batch.
    */
  def changeLogApply(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      attrCols: Seq[String], tsCol: String,
      opCol: String = "op"): DataFrame = {
    require(attrCols.nonEmpty, "changeLogApply: attrCols must be non-empty")
    val latest = changes.groupBy(col(keyCol).as("__k"))
      .agg(max(struct((col(tsCol) +: col(opCol).as("__op") +:
        attrCols.map(col)): _*)).as("__c"))
      .select(col("__k") +: col("__c.__op").as("__op") +:
        attrCols.map(a => col(s"__c.$a").as(s"__u_$a")): _*)
    snapshot.join(latest, col(keyCol) === col("__k"), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "d")
      // an insert/update wins over the snapshot row; absent keys pass
      .select(coalesce(col(keyCol), col("__k")).as(keyCol) +:
        attrCols.map(a =>
          when(col("__op").isNotNull, col(s"__u_$a"))
            .otherwise(col(a)).as(a)): _*)
  }
}
