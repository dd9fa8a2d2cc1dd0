package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Shared plumbing for the segment-partitioned standing stores
  * ([[FamilyStore]], [[SuffixStore]],
  * [[graft.streaming.StreamingMinhashDedup]]) — extracted once (r15
  * verdict: three copies of the exactly-once recipe) so every store
  * family carries the SAME load-bearing invariants:
  *
  *   - '''Exactly-once appends''' ([[writeSegment]]): every segment is
  *     keyed by `ingest_batch` under dynamic partition overwrite, so a
  *     replayed `foreachBatch` batch overwrites its own partition
  *     instead of duplicating it — the idempotent-sink recipe for
  *     at-least-once streaming replay.
  *   - '''Empty-store-safe reads''' ([[read]]): stores are read with an
  *     EXPLICIT schema. A bootstrap corpus with nothing to index writes
  *     a valid empty segment (no data files, only `_SUCCESS`), and
  *     schema inference over that layout throws
  *     `unable to infer schema` — bricking a store on a plausible
  *     first-day corpus. An explicit schema returns the empty frame the
  *     caller expects.
  *   - '''Path-own-filesystem wipes''' ([[wipe]]): full-store rewrites
  *     delete through `Path.getFileSystem`, never `FileSystem.get` —
  *     the latter resolves the DEFAULT filesystem, so on a cluster
  *     whose default fs differs from the store location (hdfs default,
  *     file:/s3a store) the delete would target the wrong fs and the
  *     following overwrite would land on a stale store.
  *   - '''Driver-free metadata''' ([[readMeta]]/[[writeMeta]]): tiny
  *     underscore-prefixed files inside the store directory (ignored by
  *     parquet listing, like `_SUCCESS`) carry store-level scalars —
  *     e.g. [[FamilyStore]]'s pointer-chain depth bound, which lets the
  *     probe size its chase statically instead of discovering closure
  *     by per-hop emptiness actions. Single-writer per store (the
  *     foreachBatch contract); a static-overwrite rewrite of the store
  *     clears them, so maintenance jobs rewrite their metadata last.
  */
object SegmentStore {

  /** Append one segment: `rows` stamped `ingest_batch = batchId`,
    * written under `partitionBy(ingest_batch, subPartitions*)`.
    * `dynamic = true` (every per-batch append) overwrites ONLY the
    * partitions present in `rows` — the exactly-once replay contract;
    * `dynamic = false` (bootstrap / full rewrite) replaces the store.
    */
  def writeSegment(rows: DataFrame, batchId: Long, path: String,
      subPartitions: Seq[String] = Nil, dynamic: Boolean = false): Unit = {
    val w = rows.withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .partitionBy(("ingest_batch" +: subPartitions): _*).parquet(path)
  }

  /** Read a store with an explicit schema (empty-store-safe — see
    * object doc), optionally partition-pruning one batch's own segment
    * out (the replay contract: a replayed batch must recompute against
    * the pre-append state, not its own previously-written rows).
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      excludeBatch: Option[Long] = None): DataFrame = {
    val base = spark.read.schema(schema).parquet(path)
    excludeBatch.foldLeft(base)((d, b) =>
      d.filter(col("ingest_batch") =!= b))
  }

  /** Delete a store directory on ITS OWN filesystem (see object doc).
    * No-op when the path does not exist.
    */
  def wipe(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    ()
  }

  /** Segment ids of a store (`ingest_batch=` partition directories).
    * Driver-side file listing; no Spark job. Shared here (r17): this
    * was the third copy of the listing across the store families.
    */
  def segmentIds(spark: SparkSession, path: String): Seq[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("ingest_batch="))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("ingest_batch=").toLong).toOption)
  }

  /** Segment count — the observable the stores' compaction policies
    * threshold on.
    */
  def segmentCount(spark: SparkSession, path: String): Long =
    segmentIds(spark, path).size.toLong

  /** Highest micro-batch id the stream owning `checkpointDir` has
    * COMMITTED, read from the checkpoint's `commits/` log — a file
    * named `<batchId>` lands there only AFTER the batch's foreachBatch
    * completed, so a batch without one can still be REPLAYED on
    * restart. `None` for a fresh or absent checkpoint. This is the
    * observable behind the automated compaction-safety rule
    * ([[graft.operators.FamilyStore.maybeCompactChecked]], r16 verdict
    * #4): folding a segment whose batch lacks a commit file would
    * strip the replay's ability to prune its own rows.
    */
  def lastCommittedBatch(spark: SparkSession,
      checkpointDir: String): Option[Long] = {
    val p = new Path(checkpointDir, "commits")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .maxOption
  }

  /** The automated compaction-safety predicate shared by every store
    * family's `maybeCompactChecked`: folding is safe iff every
    * appended segment's batch has a commit file — a segment whose
    * batch is still replayable must keep its own partition so the
    * replay can prune its rows out of the standing reads.
    */
  def foldIsSafe(spark: SparkSession, storePath: String,
      checkpointDir: String): Boolean = {
    val appended = segmentIds(spark, storePath).filter(_ >= 0L)
    appended.isEmpty ||
      lastCommittedBatch(spark, checkpointDir)
        .exists(_ >= appended.max)
  }

  /** Outcome of a checkpoint-safe compaction policy call. */
  sealed trait CompactOutcome
  /** Trigger not met — nothing to do. */
  case object CompactIdle extends CompactOutcome
  /** Trigger met and every appended segment is committed — compacted. */
  case object Compacted extends CompactOutcome
  /** Trigger met but an appended segment is still replayable (no
    * commit file yet) — fold REFUSED; call again after the stream
    * commits.
    */
  case object CompactDeferred extends CompactOutcome

  /** Write a store-level metadata scalar as `path/_<name>` (overwrites).
    * Driver-side Hadoop FS IO — no Spark job.
    */
  def writeMeta(spark: SparkSession, path: String, name: String,
      value: Long): Unit = {
    val p = new Path(path, s"_$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(value.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a metadata scalar written by [[writeMeta]]; `None` when the
    * file is absent (legacy store layouts — callers fall back to their
    * discovery path) or unparseable.
    */
  def readMeta(spark: SparkSession, path: String,
      name: String): Option[Long] = {
    val p = new Path(path, s"_$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](64)
        val n = in.read(bytes)
        if (n <= 0) None
        else scala.util.Try(
          new String(bytes, 0, n, StandardCharsets.UTF_8).trim.toLong
        ).toOption
      } finally in.close()
    }
  }
}
