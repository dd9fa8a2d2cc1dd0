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
    // double-counted band matches otherwise)
    val standingIdx = spark.read.parquet(indexPath)
      .filter(col("ingest_batch") =!= batchId)
    val standingTexts = spark.read.parquet(textPath)
      .filter(col("ingest_batch") =!= batchId)
      .drop("ingest_batch")
    // eager: the probe must see the PRE-append store (lazy evaluation
    // after the append would join the batch against its own rows)
    val pairs = Dedup.incrementalMinhashPairs(batch, standingTexts,
      standingIdx, idCol, textCol, threshold, shingleN, k, bands,
      maxBucketSize).localCheckpoint(true)
    graft.operators.SegmentStore.writeSegment(
      Dedup.minhashIndex(batch, idCol, textCol, shingleN, k, bands),
      batchId, indexPath, Seq("band"), dynamic = true)
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

  /** Periodic maintenance: re-freeze GLOBAL bucket sizes across all
    * appended segments (and compact small files). The only job that
    * re-aggregates the index — run it on the store's compaction cadence,
    * never per batch. Preserves the `ingest_batch` partitioning so
    * replay idempotence survives compaction.
    */
  def compactIndex(spark: SparkSession, indexPath: String): Unit = {
    val idx = spark.read.parquet(indexPath)
      .drop("bucket_sz")
      .withColumn("bucket_sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .localCheckpoint(true)
    idx.write.mode("overwrite").partitionBy("ingest_batch", "band")
      .parquet(indexPath)
  }
}
