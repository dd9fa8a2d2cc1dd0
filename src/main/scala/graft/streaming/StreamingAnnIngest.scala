package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IvfPq

/** Streaming ingest for the served IVF-PQ ANN index — the vector-tier
  * mirror of [[StreamingMinhashDedup]] (same daily-slice shape as the
  * reference's poll loop, `/root/reference/secedgar/core/daily.py:8-60`):
  * a standing compressed index lives ON STORAGE beside a raw-vector store
  * for exact rerank, and each micro-batch of new embeddings
  *
  *   1. PROBES the standing index — nearest existing neighbors of every
  *      batch vector (the "have we seen this embedding before" signal a
  *      curation pipeline gates ingest on), codes read cell-pruned,
  *      rerank a bounded shortlist;
  *   2. hands the neighbor pairs to the caller's sink (eagerly
  *      materialized FIRST — the append below must not leak this batch's
  *      own vectors into its probe);
  *   3. APPENDS the batch's codes and raw vectors, so batch N+1 probes
  *      against batch N.
  *
  * The model (centroids + codebooks) is FROZEN at bootstrap — appends
  * encode executor-side against it (the [[IvfPq.appendToIndex]]
  * contract: drift degrades recall, never correctness; rebuild on the
  * recall gate's cadence).
  *
  * EXACTLY-ONCE: `foreachBatch` replays a batch after a crash
  * (at-least-once), so a blind append would double the replayed batch's
  * codes — and duplicated codes don't just waste space, they can seat
  * the same neighbor twice in a served top-k. Codes and vectors are
  * partitioned by `ingest_batch` under DYNAMIC partition overwrite: a
  * replay overwrites its own `ingest_batch=<id>` partition instead of
  * duplicating it, and the probe partition-prunes its own batch id out
  * of the standing read (a replayed batch must not match its previously
  * written self). Cell-level partition pruning survives the extra
  * partition column (`cell` is the second directory level, so a static
  * cell filter still prunes within every segment).
  */
object StreamingAnnIngest {

  /** One-time bootstrap: train is the CALLER's (pass the frozen model),
    * codes + raw vectors land as `ingest_batch = -1`, model serialized
    * beside them.
    */
  def initStore(corpus: DataFrame, model: IvfPq.Model, path: String): Unit = {
    IvfPq.encode(corpus, model)
      .withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch", "cell")
      .parquet(s"$path/codes")
    corpus.select(col("id"), col("embedding"))
      .withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .parquet(s"$path/vectors")
    IvfPq.writeModel(corpus.sparkSession, model, path)
  }

  /** The foreachBatch body: probe the standing store (excluding a
    * replayed self), return the batch-vs-standing neighbor pairs
    * (eager), then append this batch's codes and vectors idempotently.
    */
  def processBatch(batch: DataFrame, batchId: Long, path: String,
      k: Int, nprobe: Int = 4, rerankFactor: Int = 4,
      model: Option[IvfPq.Model] = None): DataFrame = {
    val spark = batch.sparkSession
    // the model is frozen at bootstrap — a long-running stream loads it
    // once in attach() and passes it here, instead of a driver-side
    // parquet read per micro-batch
    val mdl = model.getOrElse(IvfPq.readModel(spark, path))
    val standingCodes = spark.read.parquet(s"$path/codes")
      .filter(col("ingest_batch") =!= batchId)
      .select(col("id"), col("cell"), col("code"), col("nrm"))
    val standingVecs = spark.read.parquet(s"$path/vectors")
      .filter(col("ingest_batch") =!= batchId)
      .select(col("id"), col("embedding"))
    // eager: the probe must see the PRE-append store (lazy evaluation
    // after the append would match the batch against its own rows)
    val nbrs = IvfPq.ivfPqTopK(batch, standingVecs, k, nprobe = nprobe,
        rerankFactor = rerankFactor, excludeSelf = false,
        model = Some(mdl), codes = Some(standingCodes))
      .localCheckpoint(true)
    IvfPq.encode(batch, mdl)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "cell").parquet(s"$path/codes")
    batch.select(col("id"), col("embedding"))
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(s"$path/vectors")
    nbrs
  }

  /** Wire an embedding stream to the store: per micro-batch, the
    * batch-vs-standing neighbor pairs go to `onNeighbors` (eagerly
    * materialized), then the batch joins the standing index.
    */
  def attach(vectors: DataFrame, path: String, k: Int,
      checkpointDir: String, nprobe: Int = 4, rerankFactor: Int = 4)(
      onNeighbors: DataFrame => Unit): StreamingQuery = {
    val mdl = IvfPq.readModel(vectors.sparkSession, path) // frozen: load once
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        onNeighbors(processBatch(b, batchId, path, k, nprobe, rerankFactor,
          Some(mdl)))
      }
      .start()
  }
}
