package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** APPEND lifecycle for the standing template-family index — the last
  * index family without a production ingest loop (r14 verdict #1: a
  * batch could PROBE the standing [[SuffixDedup.familyIndex]] but never
  * JOIN it, so day N+2 could not dedup against day N+1 without a full
  * rebuild). The recipe is [[graft.streaming.StreamingMinhashDedup]]'s:
  * segment-partitioned stores, exactly-once appends via dynamic
  * partition overwrite keyed by `ingest_batch`, and a periodic
  * compaction that re-freezes global decisions — adapted to the two
  * stores the family chain needs:
  *
  *   - INDEX store (`indexPath`): parquet partitioned by
  *     `(ingest_batch, band)`, rows `(h, doc_id, n_docs)` — each
  *     segment is the [[SuffixDedup.familyIndex]] of its batch
  *     (bootstrap corpus = segment -1). Marker rows (`doc_id` null)
  *     carry "docs represented by this marker IN THIS SEGMENT", so the
  *     probe's combined corpus count is
  *     `count(posting rows) + Σ marker n_docs` — EXACT across any
  *     number of segments (doc spaces are disjoint by contract), which
  *     is why this store needs no per-batch count re-freeze at all:
  *     where [[graft.streaming.StreamingMinhashDedup]] freezes
  *     `bucket_sz` per segment and accepts drift until compaction, the
  *     family probe ([[SuffixDedup.batchProbeEdges]]) computes current
  *     combined counts from the segment rows it already reads.
  *
  *   - LABELS store (`labelsPath`): parquet partitioned by
  *     `ingest_batch`, rows `(id, label)` — the standing component
  *     labels, written as POINTER segments: the bootstrap segment holds
  *     [[SuffixDedup.familyLabels]] of the corpus, and each batch
  *     appends its probe's contracted-component table (batch ids,
  *     touched corpus ids, and — the load-bearing rows — merged
  *     standing LABELS re-pointed at the new component minimum, so a
  *     batch that bridges two standing families never rewrites the
  *     families' member rows; it writes ONE pointer row per merged
  *     label). Resolution fetches the pointer CLOSURE of the touched
  *     ids latest-segment-first ([[fetchPointerClosure]]) and folds the
  *     rows into the probe's single components pass — union-find with
  *     path compression done relationally; chains deepen by at most one
  *     generation per bridging batch and flatten at [[compact]].
  *
  * Equality contract (the `q_family_append` oracle): with id spaces
  * disjoint and no gram crossing the cap boundary between increments,
  * probing batch B against the store after appending batches A1..An to
  * bootstrap C equals the whole-corpus
  * `spanPairs + connectedComponents` rerun over C ∪ A1..An ∪ B
  * restricted to B — the [[SuffixDedup.incrementalFamilies]] contract
  * extended over appends by induction (the probe's components pass
  * runs over batch edges ∪ the touched pointer closure, whose fixpoint
  * resolves stale pointers and contracts in the same pass — minima
  * provably equal the resolve-then-contract form, see
  * [[probeWithComponents]]). Cap-boundary crossings keep the
  * frozen-cap semantics documented on
  * [[SuffixDedup.incrementalFamilies]]: standing edges are never
  * unlinked; new edges see current combined counts.
  *
  * Scale shape per batch: standing index scanned once through a
  * broadcast batch-key semi-join (band partitioning keeps files
  * bounded; the probe never shuffles the index), labels store scanned
  * once per chase hop through a broadcast frontier semi-join (hops =
  * pointer-chain depth, bounded by bridging generations since the last
  * [[compact]] and hard-capped by `maxChase`), writes are one new
  * segment pair. Nothing corpus-sized ever shuffles on the hot path.
  */
object FamilyStore {

  /** One-time bootstrap: write the corpus [[SuffixDedup.familyIndex]]
    * and [[SuffixDedup.familyLabels]] as segment -1 of the two stores.
    */
  def init(corpus: DataFrame, idCol: String, textCol: String,
      indexPath: String, labelsPath: String, minLen: Int,
      maxDocsPerGram: Int = 1000, nBands: Int = 64): Unit = {
    val idx = SuffixDedup.familyIndex(corpus, idCol, textCol, minLen,
      maxDocsPerGram).localCheckpoint(true)
    writeIndexSegment(idx, -1L, indexPath, nBands)
    writeLabelSegment(SuffixDedup.familyLabels(idx, maxDocsPerGram), -1L,
      labelsPath)
  }

  /** Read-only probe: family labels for every batch doc against the
    * standing store — equals the whole-corpus rerun restricted to the
    * batch (see object doc). Appends nothing; use [[processBatch]] for
    * the ingest loop.
    */
  def probe(batch: DataFrame, idCol: String, textCol: String,
      indexPath: String, labelsPath: String, minLen: Int,
      maxDocsPerGram: Int = 1000, maxChase: Int = 20): DataFrame =
    probeWithComponents(batch, idCol, textCol, indexPath, labelsPath,
      minLen, maxDocsPerGram, maxChase, excludeBatch = None)._1

  /** The foreachBatch body: probe the standing store, return the
    * batch's family labels (EAGER — the appends below must not leak
    * this batch's own rows into its probe), then append the batch's
    * index segment and label-update segment.
    *
    * EXACTLY-ONCE: both writes are keyed by `batchId` under dynamic
    * partition overwrite, and the probe partition-prunes
    * `ingest_batch = batchId` out of both standing reads — a replayed
    * batch recomputes against the same pre-append state and overwrites
    * its own segments instead of duplicating them (the
    * [[graft.streaming.StreamingMinhashDedup.processBatch]] recipe).
    * Batch ids must be disjoint from everything already in the store.
    */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, indexPath: String, labelsPath: String, minLen: Int,
      maxDocsPerGram: Int = 1000, nBands: Int = 64,
      maxChase: Int = 20): DataFrame = {
    val (fams, comps) = probeWithComponents(batch, idCol, textCol,
      indexPath, labelsPath, minLen, maxDocsPerGram, maxChase,
      excludeBatch = Some(batchId))
    // eager BEFORE the appends: both outputs must reflect the
    // pre-append store (lazy evaluation after the writes would probe
    // the batch against its own rows)
    val famsOut = fams.localCheckpoint(true)
    val updates = comps.filter(col("id") =!= col("label"))
      .localCheckpoint(true)
    writeIndexSegment(
      SuffixDedup.familyIndex(batch, idCol, textCol, minLen,
        maxDocsPerGram),
      batchId, indexPath, nBands, dynamic = true)
    writeLabelSegment(updates, batchId, labelsPath, dynamic = true)
    famsOut
  }

  /** Periodic maintenance — the only job that touches corpus-scale
    * state, run on the store's compaction cadence, never per batch:
    *
    *   1. LABELS: flatten pointer chains (full path compression) —
    *      min-label CC over the whole pointer graph, each id rewritten
    *      to its final label in its LATEST segment, superseded older
    *      rows dropped. After this, [[fetchPointerClosure]] closes in
    *      one hop until the next bridging batch.
    *   2. INDEX: re-resolve over-cap ACROSS segments — a gram whose
    *      COMBINED count exceeds the cap can never contribute new
    *      edges again (counts only grow), so its posting rows collapse
    *      to one marker per segment carrying that segment's count; the
    *      probe's combined-count formula reads the same total from the
    *      markers. Under-cap rows are untouched. Also compacts small
    *      files.
    *
    * Both rewrites preserve the `ingest_batch` partitioning, so replay
    * idempotence survives compaction (a replayed batch still overwrites
    * only its own segments).
    */
  def compact(spark: SparkSession, indexPath: String, labelsPath: String,
      maxDocsPerGram: Int = 1000): Unit = {
    // ---- labels: full path compression ----
    val lbl = spark.read.parquet(labelsPath)
      .select(col("id"), col("label"), col("ingest_batch"))
    val latest = lbl.groupBy(col("id"))
      .agg(max_by(struct(col("label"), col("ingest_batch")),
        col("ingest_batch")).as("b"))
      .select(col("id"), col("b.label").as("label"),
        col("b.ingest_batch").as("ingest_batch"))
    val resolved = Dedup.connectedComponents(
        latest.select(col("id").as("id_a"), col("label").as("id_b")))
      .withColumnRenamed("label", "final")
    val flat = latest.join(resolved, Seq("id"), "left")
      .select(col("id"), coalesce(col("final"), col("label")).as("label"),
        col("ingest_batch"))
      .filter(col("id") =!= col("label"))
      .localCheckpoint(true)
    flat.write.mode("overwrite").partitionBy("ingest_batch")
      .parquet(labelsPath)

    // ---- index: collapse globally-over-cap postings to markers ----
    val idx = spark.read.parquet(indexPath)
      .select(col("h"), col("doc_id"), col("n_docs"), col("ingest_batch"),
        col("band"))
    val totals = idx.groupBy(col("h"))
      .agg((sum(when(col("doc_id").isNotNull, 1L).otherwise(0L)) +
        coalesce(sum(when(col("doc_id").isNull, col("n_docs"))), lit(0L)))
        .as("__tot"))
      .filter(col("__tot") > maxDocsPerGram)
      .select(col("h"))
    val over = idx.join(totals, Seq("h"), "left_semi")
    val under = idx.join(totals, Seq("h"), "left_anti")
    // per (h, segment): one marker carrying postings-count + existing
    // marker counts (a segment can hold either shape pre-compaction)
    val collapsed = over.groupBy(col("h"), col("ingest_batch"), col("band"))
      .agg((sum(when(col("doc_id").isNotNull, 1L).otherwise(0L)) +
        coalesce(sum(when(col("doc_id").isNull, col("n_docs"))), lit(0L)))
        .as("n_docs"))
      .select(col("h"), lit(null).cast("long").as("doc_id"),
        col("n_docs"), col("ingest_batch"), col("band"))
    val rewritten = under.unionByName(collapsed)
      .repartition(col("ingest_batch"), col("band"))
      .localCheckpoint(true)
    rewritten.write.mode("overwrite").partitionBy("ingest_batch", "band")
      .parquet(indexPath)
  }

  /** The probe core: standing reads (optionally excluding a replayed
    * batch's own segments), batch edges, pointer-closure fetch, one
    * fused components pass. Returns (batch families, full component
    * table over batch ids + touched corpus ids + closure labels — the
    * label-update set, which path-compresses touched stale rows for
    * free).
    */
  private def probeWithComponents(batch: DataFrame, idCol: String,
      textCol: String, indexPath: String, labelsPath: String, minLen: Int,
      maxDocsPerGram: Int, maxChase: Int,
      excludeBatch: Option[Long]): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val idx = excludeBatch.foldLeft(
        spark.read.parquet(indexPath)
          .select(col("h"), col("doc_id"), col("n_docs"),
            col("ingest_batch"))) {
        (d, b) => d.filter(col("ingest_batch") =!= b)
      }
      .select(col("h"), col("doc_id"), col("n_docs"))
    val edges = SuffixDedup.batchProbeEdges(batch, idCol, textCol, idx,
      minLen, maxDocsPerGram).localCheckpoint(true)
    val touched = edges.select(col("id_a").as("id"))
      .unionByName(edges.select(col("id_b").as("id"))).distinct()
    val pointers = fetchPointerClosure(spark, labelsPath, touched,
      maxChase, excludeBatch)
    // ONE components pass over batch edges ∪ pointer rows replaces the
    // r15-initial resolve-then-contract two-CC chain: connecting each
    // touched endpoint to its pointer chain preserves exactly the
    // contracted graph's connectivity (x—L—F reaches whatever the
    // contracted L/F node reached), and the min is unchanged — every
    // corpus id in a component is ≥ its standing label (labels are
    // component minima), so adding the raw ids and intermediate labels
    // as nodes never lowers a component's minimum below the contracted
    // result. One CC phase per probe instead of two; the pointer-CC of
    // resolveTouched existed only to pre-resolve what this pass now
    // resolves in the same fixpoint.
    val comps = Dedup.connectedComponents(edges.unionByName(
        pointers.select(col("id").as("id_a"), col("label").as("id_b"))))
      .localCheckpoint(true)
    val fams = batch.select(col(idCol).as("doc_id"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("family"))
    (fams, comps)
  }

  /** Fetch the pointer CLOSURE of every touched id: per hop, the
    * LATEST row per frontier id (broadcast frontier semi-join — the
    * store is scanned, never shuffled), new label values feed back as
    * the next frontier until it closes. Returns the raw `(id, label)`
    * pointer rows — chain RESOLUTION happens inside the caller's
    * single components pass, not here (pointer targets strictly
    * decrease — `label < id` everywhere in the store — so the closure
    * is a forest the CC fixpoint flattens for free). Ids with no row
    * resolve to themselves via the caller's coalesce. Throws past
    * `maxChase` hops — chains deeper than the bridging generations
    * since the last [[compact]] mean compaction is overdue, and a
    * silent partial closure would mislabel.
    */
  private def fetchPointerClosure(spark: SparkSession, labelsPath: String,
      touched: DataFrame, maxChase: Int,
      excludeBatch: Option[Long]): DataFrame = {
    val store = excludeBatch.foldLeft(
        spark.read.parquet(labelsPath)
          .select(col("id"), col("label"), col("ingest_batch"))) {
        (d, b) => d.filter(col("ingest_batch") =!= b)
      }
      // identity rows (component centers label themselves) carry no
      // information — resolution already defaults to self
      .filter(col("id") =!= col("label"))
    var frontier = touched.select(col("id")).distinct()
      .localCheckpoint(true)
    var visited = frontier
    var pointers: Option[DataFrame] = None
    var hops = 0
    var closed = false
    while (!closed && hops < maxChase) {
      val rows = store.join(broadcast(frontier), Seq("id"))
        .groupBy(col("id"))
        .agg(max_by(col("label"), col("ingest_batch")).as("label"))
        .localCheckpoint(true)
      if (rows.isEmpty) closed = true
      else {
        pointers = Some(pointers.fold(rows)(_.unionByName(rows)))
        frontier = rows.select(col("label").as("id")).distinct()
          .join(visited, Seq("id"), "left_anti")
          .localCheckpoint(true)
        if (frontier.isEmpty) closed = true
        else visited = visited.unionByName(frontier).localCheckpoint(true)
      }
      hops += 1
    }
    if (!closed)
      throw new IllegalStateException(
        s"FamilyStore.fetchPointerClosure: pointer chains deeper than " +
          s"maxChase=$maxChase — run FamilyStore.compact to flatten the " +
          "labels store (or raise maxChase deliberately)")
    pointers.getOrElse(
      touched.select(col("id"), col("id").as("label")).limit(0))
  }

  private def writeIndexSegment(index: DataFrame, batchId: Long,
      path: String, nBands: Int, dynamic: Boolean = false): Unit = {
    require(nBands >= 1, s"nBands must be >= 1, got $nBands")
    val w = index
      .withColumn("ingest_batch", lit(batchId))
      .withColumn("band", pmod(col("h"), lit(nBands.toLong)))
      .repartition(col("band"))
      .write.mode("overwrite")
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .partitionBy("ingest_batch", "band").parquet(path)
  }

  private def writeLabelSegment(labels: DataFrame, batchId: Long,
      path: String, dynamic: Boolean = false): Unit = {
    val w = labels
      .select(col("id"), col("label"))
      // identity rows are dead weight (see fetchPointerClosure) —
      // dropped here so bootstrap familyLabels output doesn't carry
      // its component-center self-rows into the store
      .filter(col("id") =!= col("label"))
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .partitionBy("ingest_batch").parquet(path)
  }
}
