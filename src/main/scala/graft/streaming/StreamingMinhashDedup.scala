package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Cross-batch streaming NEAR-dup dedup — the index-append production
  * follow-on to the frozen-index probe proven in StreamingCorpusSpec
  * (reference analog: the daily poll loop,
  * `/root/reference/secedgar/core/daily.py:8-60`, which lands one new
  * slice per day against an ever-growing standing corpus).
  *
  * The standing MinHash LSH index lives ON STORAGE, `partitionBy("band")`
  * (probe joins prune per band — see [[graft.operators.Dedup.minhashIndex]]),
  * beside a text store for Jaccard verification of survivors. Each
  * micro-batch:
  *
  *   1. probes the standing index + text store via
  *      [[graft.operators.Dedup.incrementalMinhashPairs]] — corpus side is
  *      scanned, never re-signed or shuffled; batch index is broadcast;
  *   2. hands the verified pairs to the caller's sink (eagerly
  *      materialized FIRST — the append below must not leak this batch's
  *      own rows into its probe);
  *   3. APPENDS the batch's band keys and texts — so batch N+1 dedups
  *      against batch N, closing the intra-day duplicate window the
  *      frozen-index variant leaves open.
  *
  * Bucket-size caps are per-SEGMENT under append (each batch freezes its
  * own `bucket_sz`; a bucket growing across many small segments is not
  * re-aggregated on the hot path — that would re-shuffle the corpus per
  * batch). [[compactIndex]] is the periodic maintenance job that
  * re-freezes GLOBAL bucket sizes; run it on the compaction cadence the
  * store already needs for small-file hygiene.
  *
  * Scale shape: per batch the standing index is read band-pruned and
  * map-side joined against a broadcast batch index; writes are one new
  * segment per batch. State lives in the store, not the driver — a
  * checkpoint-restarted stream resumes against the same standing index.
  * Segment plumbing (exactly-once writes keyed by `ingest_batch`) is
  * shared via [[graft.operators.SegmentStore]] — the same recipe
  * [[graft.operators.FamilyStore]] and [[graft.operators.SuffixStore]]
  * run.
  */
object StreamingMinhashDedup {

  /** One-time bootstrap: sign the standing corpus, write its LSH index
    * (partitioned by ingest batch then band — the bootstrap corpus is
    * `ingest_batch = -1`) and its text store.
    */
  def initIndex(corpus: DataFrame, idCol: String, textCol: String,
      indexPath: String, textPath: String, shingleN: Int = 3,
      k: Int = 32, bands: Int = 16): Unit = {
    graft.operators.SegmentStore.writeSegment(
      Dedup.minhashIndex(corpus, idCol, textCol, shingleN, k, bands),
      -1L, indexPath, Seq("band"))
    graft.operators.SegmentStore.writeSegment(
      corpus.select(col(idCol), col(textCol)), -1L, textPath)
  }

  /** The foreachBatch body: probe the standing index, return verified
    * pairs (eager), then append this batch's index rows and texts.
    * Batch ids must be disjoint from everything already in the store
    * (the natural monotonically-assigned shape).
    *
    * EXACTLY-ONCE: `foreachBatch` replays a batch after a crash
    * (at-least-once), so a blind append would double the replayed
    * batch's index rows. Writes are keyed by `batchId` under DYNAMIC
    * partition overwrite — a replay overwrites its own
    * `ingest_batch=<id>` partition instead of duplicating it, the
    * standard idempotent-sink recipe for foreachBatch.
    */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, indexPath: String, textPath: String,
      threshold: Double, shingleN: Int = 3, k: Int = 32, bands: Int = 16,
      maxBucketSize: Int = 1000): DataFrame = {
    val spark = batch.sparkSession
    // a REPLAYED batch must not probe its own previously-written rows:
    // partition-prune them out of the standing read (self-pairs and
    // double-counted band matches otherwise). The marker-aware view
    // (shared fold plumbing): mid-[[compactPrefix]] the folded
    // segments' rows are served from the staged bootstrap segment.
    val standingIdx = graft.operators.SegmentStore
      .readRawView(spark, indexPath)
      .filter(col("ingest_batch") =!= batchId)
    val standingTexts = graft.operators.SegmentStore
      .readRawView(spark, textPath)
      .filter(col("ingest_batch") =!= batchId)
      .drop("ingest_batch")
    // sign the batch ONCE (r17 fusion): the checkpointed 16-rows/doc
    // index frame serves the probe's broadcast side, its batch-internal
    // candidates, AND the segment append below — the unfused form ran
    // the shingle+signature pass three times per batch
    val bIdx = Dedup.minhashIndex(batch, idCol, textCol, shingleN, k,
      bands).localCheckpoint(true)
    // eager: the probe must see the PRE-append store (lazy evaluation
    // after the append would join the batch against its own rows)
    val pairs = Dedup.incrementalMinhashPairsFromIndex(batch,
      standingTexts, standingIdx, bIdx, idCol, textCol, threshold,
      shingleN, maxBucketSize).localCheckpoint(true)
    graft.operators.SegmentStore.writeSegment(
      bIdx, batchId, indexPath, Seq("band"), dynamic = true)
    graft.operators.SegmentStore.writeSegment(
      batch.select(col(idCol), col(textCol)), batchId, textPath,
      dynamic = true)
    pairs
  }

  /** Wire a document stream to the store: per micro-batch, verified
    * near-dup pairs go to `onPairs`, then the batch joins the standing
    * index. `onPairs` receives an eagerly-materialized frame.
    */
  def attach(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, textPath: String, threshold: Double,
      checkpointDir: String, shingleN: Int = 3, k: Int = 32,
      bands: Int = 16, maxBucketSize: Int = 1000)(
      onPairs: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        onPairs(processBatch(b, batchId, idCol, textCol, indexPath,
          textPath, threshold, shingleN, k, bands, maxBucketSize))
      }
      .start()

  /** Segment count of the index store — the observable [[maybeCompact]]
    * thresholds on (the shared [[graft.operators.SegmentStore
    * .segmentCount]] listing; driver-side, no Spark job).
    */
  def segmentCount(spark: SparkSession, indexPath: String): Long =
    graft.operators.SegmentStore.segmentCount(spark, indexPath)

  /** Threshold-triggered [[compactIndex]] — the
    * [[graft.operators.FamilyStore.maybeCompact]] policy shape at this
    * store's one accumulating dimension (r16 verdict #2: this store
    * had `compactIndex` but no trigger — its append lifecycle was
    * inherited, not exercised). Segment count is the right observable:
    * the per-segment frozen `bucket_sz` drifts from the global truth
    * exactly as segments accumulate, and the fold below re-freezes it.
    * Returns whether compaction ran. Call it where [[compactIndex]] is
    * safe — after the stream's checkpoint has advanced past the folded
    * batches.
    */
  def maybeCompact(spark: SparkSession, indexPath: String,
      textPath: String, maxSegments: Long = 64L): Boolean = {
    val fire = segmentCount(spark, indexPath) > maxSegments
    if (fire) compactIndex(spark, indexPath, textPath)
    fire
  }

  /** [[maybeCompact]] under the AUTOMATED checkpoint-safety rule (the
    * [[graft.operators.FamilyStore.maybeCompactChecked]] shape, shared
    * decision core [[graft.operators.SegmentStore.checkedFold]]): a
    * full fold runs only when every appended segment's batch has a
    * commit file in the owning stream's checkpoint; with a replayable
    * tail, the COMMITTED PREFIX is folded instead ([[compactPrefix]] —
    * replay-safe by construction, so a never-idle stream's in-stream
    * policy calls make progress); only a store with NOTHING committed
    * defers.
    */
  def maybeCompactChecked(spark: SparkSession, indexPath: String,
      textPath: String, checkpointDir: String, maxSegments: Long = 64L)
      : graft.operators.SegmentStore.CompactOutcome = {
    import graft.operators.SegmentStore
    if (segmentCount(spark, indexPath) <= maxSegments)
      SegmentStore.CompactIdle
    else SegmentStore.checkedFold(spark, indexPath, checkpointDir)(
      upTo => compactPrefix(spark, indexPath, textPath, upTo))
  }

  /** Committed-prefix [[compactIndex]]: fold only the segments with
    * `ingest_batch <= upTo` (bootstrap + every COMMITTED batch) of
    * BOTH stores into segment -1, re-freezing the folded rows'
    * `bucket_sz` over the PREFIX (the same truth-restoration the full
    * fold applies globally, restricted to the rows it owns; live
    * segments keep their per-segment frozen sizes — the documented
    * drift-until-compaction contract). Replayable segments stay in
    * place, so the fold is safe under a running stream; the
    * [[graft.operators.SegmentStore.foldPrefix]] marker keeps
    * concurrent probes consistent mid-protocol.
    */
  def compactPrefix(spark: SparkSession, indexPath: String,
      textPath: String, upTo: Long): Unit = {
    import graft.operators.SegmentStore
    SegmentStore.completeFold(spark, indexPath)
    SegmentStore.completeFold(spark, textPath)
    val idx = spark.read.parquet(indexPath)
      .filter(col("ingest_batch") <= upTo)
      .drop("bucket_sz", "ingest_batch")
      .withColumn("bucket_sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .repartition(col("band"))
      .localCheckpoint(true)
    SegmentStore.foldPrefix(spark, indexPath, upTo, idx, Seq("band"))
    val txt = spark.read.parquet(textPath)
      .filter(col("ingest_batch") <= upTo)
      .drop("ingest_batch")
      .localCheckpoint(true)
    SegmentStore.foldPrefix(spark, textPath, upTo, txt)
  }

  /** Periodic maintenance: fold EVERY segment — index and texts — into
    * the bootstrap segment (-1), re-freezing GLOBAL bucket sizes in the
    * same pass. The only job that re-aggregates the index; run it on
    * the compaction cadence, never per batch. Folding re-arms the
    * [[maybeCompact]] segment-count trigger and restores one file set
    * per band (the pre-r17 rewrite preserved per-batch partitioning, so
    * the segment count never dropped and a count-triggered policy would
    * re-fire forever).
    *
    * REPLAY NOTE (the [[graft.operators.SuffixStore.compact]] /
    * [[graft.operators.FamilyStore.compact]] trade): a batch folded
    * into -1 can no longer prune its own rows out of a replayed probe —
    * run compaction after the stream's checkpoint has advanced past the
    * folded batches.
    */
  def compactIndex(spark: SparkSession, indexPath: String,
      textPath: String): Unit = {
    val idx = spark.read.parquet(indexPath)
      .drop("bucket_sz", "ingest_batch")
      .withColumn("bucket_sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .localCheckpoint(true)
    graft.operators.SegmentStore.wipe(spark, indexPath)
    graft.operators.SegmentStore.writeSegment(
      idx.repartition(col("band")), -1L, indexPath, Seq("band"))
    val txt = spark.read.parquet(textPath).drop("ingest_batch")
      .localCheckpoint(true)
    graft.operators.SegmentStore.wipe(spark, textPath)
    graft.operators.SegmentStore.writeSegment(txt, -1L, textPath)
  }
}
