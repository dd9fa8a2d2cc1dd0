package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Warehouse

/** Streaming SCD2 dimension maintenance — the micro-batch face of
  * [[Warehouse.scd2Merge]]: a standing versioned dimension lives on
  * storage as snapshot partitions, and each micro-batch of update events
  * closes/opens versions against the latest snapshot.
  *
  * EXACTLY-ONCE: `foreachBatch` replays a batch after a crash
  * (at-least-once). Each merge writes a FULL new snapshot under
  * `snap=<batchId>` with dynamic partition overwrite, and reads its
  * input as the LARGEST `snap < batchId` — so a replayed batch rebuilds
  * its own snapshot from the same predecessor and overwrites its own
  * partition: byte-identical, no double-close. (The merge is also
  * value-idempotent — re-applying an identical update batch to its own
  * result is a no-op — but the snapshot chain makes replay exact even
  * when a crash interleaved with the write.)
  *
  * Each batch folds intra-batch churn to one row per key first
  * (lexicographic struct argmax on `(ts, attrs)`, the
  * [[Warehouse.changeLogApply]] winner rule) — scd2Merge's one-update-
  * per-key contract, enforced here rather than assumed.
  *
  * Scale: a full-dimension rewrite per micro-batch. That is the right
  * trade for dimensions (provenance/source/license tables — millions of
  * rows beside trillion-row facts) at streaming cadence; retention of
  * old `snap=` partitions doubles as time travel, pruned by any
  * compaction job that drops all but the latest K.
  */
object StreamingDimension {

  /** One-time bootstrap: the initial history (rows open-ended unless
    * already closed) lands as `snap = -1`.
    */
  def initDim(history: DataFrame, path: String): Unit =
    history.withColumn("snap", lit(-1L))
      .write.mode("overwrite").partitionBy("snap").parquet(path)

  /** The foreachBatch body: merge one update batch into the latest
    * predecessor snapshot and write `snap=<batchId>`. Returns the merged
    * dimension (the written snapshot's content).
    */
  def processBatch(updates: DataFrame, batchId: Long, path: String,
      keyCol: String, attrCols: Seq[String], tsCol: String): DataFrame = {
    val spark = updates.sparkSession
    val store = spark.read.parquet(path)
    // latest snapshot strictly below this batch id: a replay re-reads its
    // original predecessor, not its own half-written output
    // partition-value inference may type `snap` as int — normalize
    val prevSnap = store.filter(col("snap") < batchId)
      .agg(max(col("snap")).cast("long")).collect().head.getLong(0)
    val standing = store.filter(col("snap") === prevSnap).drop("snap")
    // fold intra-batch churn: latest (ts, attrs) per key wins
    val folded = updates
      .groupBy(col(keyCol).as("__k"))
      .agg(max(struct((col(tsCol) +: attrCols.map(col)): _*)).as("__c"))
      .select(col("__k").as(keyCol) +: (col(s"__c.$tsCol").as(tsCol) +:
        attrCols.map(a => col(s"__c.$a").as(a))): _*)
    val merged = Warehouse.scd2Merge(standing, folded, keyCol, attrCols,
      tsCol).localCheckpoint(true) // eager: written below, returned after
    merged.withColumn("snap", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("snap").parquet(path)
    merged
  }

  /** Wire an update stream to the dimension store; the merged snapshot
    * of each batch goes to `onMerged`.
    */
  def attach(updates: DataFrame, path: String, keyCol: String,
      attrCols: Seq[String], tsCol: String, checkpointDir: String)(
      onMerged: DataFrame => Unit): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        onMerged(processBatch(b, batchId, path, keyCol, attrCols, tsCol))
      }
      .start()

  /** Retention: drop all but the newest `keepLast` snapshot partitions
    * (the time-travel window). Safe beside a live stream — processBatch
    * only ever reads the LATEST predecessor, which is always kept
    * (`keepLast ≥ 1`), and a replayed batch's own partition is newer
    * than any it would read.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      keepLast: Int = 3): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val snaps = spark.read.parquet(path)
      .select(col("snap").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val drop = snaps.dropRight(keepLast)
    if (drop.nonEmpty) {
      val conf = spark.sparkContext.hadoopConfiguration
      val base = new org.apache.hadoop.fs.Path(path)
      val fs = base.getFileSystem(conf)
      drop.foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(base, s"snap=$v"), true)
      }
    }
  }

  /** Read the current (latest-snapshot) dimension from the store. */
  def latest(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val store = spark.read.parquet(path)
    val snap = store.agg(max(col("snap")).cast("long")).collect().head.getLong(0)
    store.filter(col("snap") === snap).drop("snap")
  }
}
