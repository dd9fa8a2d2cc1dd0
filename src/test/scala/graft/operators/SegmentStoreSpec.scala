package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The shared segment plumbing directly (beyond the store-level specs
  * that exercise it end-to-end): exactly-once dynamic overwrite,
  * empty-store-safe schema reads, replay pruning, metadata round-trip,
  * and wipe.
  */
class SegmentStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType),
    StructField("ingest_batch", LongType)))

  private def tmp() =
    java.nio.file.Files.createTempDirectory("segstore").toString + "/s"

  test("dynamic overwrite replaces ONLY the replayed batch's segment; " +
      "static overwrite replaces the store") {
    val path = tmp()
    SegmentStore.writeSegment(Seq((1L, 10L)).toDF("k", "v"), -1L, path)
    SegmentStore.writeSegment(Seq((2L, 20L)).toDF("k", "v"), 0L, path,
      dynamic = true)
    SegmentStore.writeSegment(Seq((3L, 30L)).toDF("k", "v"), 1L, path,
      dynamic = true)
    // replay batch 0 with different content: its segment is replaced,
    // the bootstrap and batch-1 segments are untouched
    SegmentStore.writeSegment(Seq((2L, 99L)).toDF("k", "v"), 0L, path,
      dynamic = true)
    val got = SegmentStore.read(spark, path, Schema)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, -1L), (2L, 99L, 0L), (3L, 30L, 1L)))
    // replay pruning: the excluded batch's rows vanish from the read
    assert(SegmentStore.read(spark, path, Schema, excludeBatch = Some(0L))
      .as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 10L, -1L), (3L, 30L, 1L)))
    // static overwrite (a compaction rewrite) replaces everything
    SegmentStore.writeSegment(Seq((9L, 90L)).toDF("k", "v"), -1L, path)
    assert(SegmentStore.read(spark, path, Schema)
      .as[(Long, Long, Long)].collect().toSet == Set((9L, 90L, -1L)))
  }

  test("an EMPTY segment write leaves a store the schema read serves " +
      "(inference would throw unable-to-infer-schema)") {
    val path = tmp()
    SegmentStore.writeSegment(
      Seq.empty[(Long, Long)].toDF("k", "v"), -1L, path)
    assert(SegmentStore.read(spark, path, Schema).count() == 0L)
    // and a later append makes it non-empty without ceremony
    SegmentStore.writeSegment(Seq((5L, 50L)).toDF("k", "v"), 0L, path,
      dynamic = true)
    assert(SegmentStore.read(spark, path, Schema).count() == 1L)
  }

  test("metadata round-trip: absent -> None, write/overwrite/read, " +
      "and a static store rewrite clears it (maintenance jobs rewrite " +
      "their metadata last)") {
    val path = tmp()
    SegmentStore.writeSegment(Seq((1L, 10L)).toDF("k", "v"), -1L, path)
    assert(SegmentStore.readMeta(spark, path, "depth").isEmpty)
    SegmentStore.writeMeta(spark, path, "depth", 3L)
    assert(SegmentStore.readMeta(spark, path, "depth").contains(3L))
    SegmentStore.writeMeta(spark, path, "depth", 7L)
    assert(SegmentStore.readMeta(spark, path, "depth").contains(7L))
    // the parquet read ignores the underscore-prefixed metadata file
    assert(SegmentStore.read(spark, path, Schema).count() == 1L)
    SegmentStore.writeSegment(Seq((2L, 20L)).toDF("k", "v"), -1L, path)
    assert(SegmentStore.readMeta(spark, path, "depth").isEmpty,
      "static overwrite must clear store metadata")
  }

  test("foldIsSafe / lastCommittedBatch: safe only when every appended " +
      "segment's batch has a commit file (the shared predicate behind " +
      "every store family's maybeCompactChecked)") {
    val store = tmp()
    Seq((1L, 2L)).toDF("k", "v").write.mode("overwrite")
      .parquet(s"$store/ingest_batch=-1")
    Seq((1L, 2L)).toDF("k", "v").write.mode("append")
      .parquet(s"$store/ingest_batch=0")
    Seq((1L, 2L)).toDF("k", "v").write.mode("append")
      .parquet(s"$store/ingest_batch=1")
    val ckpt = java.nio.file.Files.createTempDirectory("segckpt")
      .toString
    // fresh checkpoint: nothing committed → unsafe (both appended
    // segments replayable)
    assert(SegmentStore.lastCommittedBatch(spark, ckpt).isEmpty)
    assert(!SegmentStore.foldIsSafe(spark, store, ckpt))
    // commits/0 only: segment 1 still replayable → unsafe
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    java.nio.file.Files.createDirectories(commits)
    java.nio.file.Files.writeString(commits.resolve("0"), "v1\n{}")
    assert(SegmentStore.lastCommittedBatch(spark, ckpt).contains(0L))
    assert(!SegmentStore.foldIsSafe(spark, store, ckpt))
    // commits/1: every appended segment committed → safe (the
    // bootstrap segment -1 never counts; non-numeric names ignored)
    java.nio.file.Files.writeString(commits.resolve("1"), "v1\n{}")
    java.nio.file.Files.writeString(commits.resolve(".1.tmp"), "x")
    assert(SegmentStore.lastCommittedBatch(spark, ckpt).contains(1L))
    assert(SegmentStore.foldIsSafe(spark, store, ckpt))
  }

  test("wipe deletes the store on its own filesystem and is a no-op " +
      "on a missing path") {
    val path = tmp()
    SegmentStore.writeSegment(Seq((1L, 10L)).toDF("k", "v"), -1L, path)
    SegmentStore.wipe(spark, path)
    assert(!new java.io.File(path).exists())
    SegmentStore.wipe(spark, path) // idempotent
  }
}
