package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout operators: multi-dimensional clustering (Morton/Z-order)
  * and the min/max file-skipping stats a scan planner prunes with.
  *
  * At 100 TB, layout IS the query optimizer's biggest lever: a scan that
  * skips 95% of files beats any in-memory trick. The pattern here is the
  * OPTIMIZE-style clustering pass: interleave the bits of the filter
  * dimensions into one sort key, range-partition files by that key, and
  * keep per-file min/max of the ORIGINAL columns — a 2-D probe then
  * prunes on both dimensions, where a 1-D sorted layout prunes on one.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of `x` (even
    * positions) and `y` (odd positions). Unrolled fold of codegen'd
    * shift/mask builtins — `bits` is a plan-time constant, so the whole
    * key is one whole-stage-codegen expression, map-side, shuffle-free.
    * Coordinates must be non-negative; bits above `bits` are ignored
    * (callers bucket/clamp first when the domain is wider).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x.cast(LongType), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast(LongType), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** Cluster rows into `numFiles` write tasks by z-order: range-partition
    * on the interleaved key and sort within partitions, so each output
    * file covers one contiguous z-range (a compact curve tile in (x,y)
    * space). This is the write-side op; [[zLayoutFiles]] is its
    * planning-stats face.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int): DataFrame =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")

  /** Per-file min/max stats under a z-order layout: file = the top
    * `filePrefixBits` of the interleaved key, i.e. a fixed tiling of the
    * curve (deterministic and engine-replayable, unlike row-count-balanced
    * range splits). One map-side key computation + one partial agg.
    */
  def zLayoutFiles(df: DataFrame, xCol: String, yCol: String, bits: Int,
      filePrefixBits: Int): DataFrame = {
    require(filePrefixBits >= 1 && filePrefixBits <= 2 * bits,
      s"filePrefixBits must be in [1,${2 * bits}], got $filePrefixBits")
    fileStats(df.withColumn("file_id",
      shiftright(zValue(col(xCol), col(yCol), bits), 2 * bits - filePrefixBits)),
      xCol, yCol)
  }

  /** Per-file stats under a 1-D range layout on `x` alone (the classic
    * sort-by-one-column baseline): file = top `filePrefixBits` of x's low
    * `bits` bits.
    */
  def linearLayoutFiles(df: DataFrame, xCol: String, yCol: String, bits: Int,
      filePrefixBits: Int): DataFrame = {
    require(filePrefixBits >= 1 && filePrefixBits <= bits,
      s"filePrefixBits must be in [1,$bits], got $filePrefixBits")
    fileStats(df.withColumn("file_id",
      shiftright(col(xCol).cast(LongType), bits - filePrefixBits)),
      xCol, yCol)
  }

  private def fileStats(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol).cast(LongType)).as("min_x"),
        max(col(xCol).cast(LongType)).as("max_x"),
        min(col(yCol).cast(LongType)).as("min_y"),
        max(col(yCol).cast(LongType)).as("max_y"))

  /** Min/max pruning verdict for a rectangle probe over a file-stats
    * table: a file is scanned iff its [min,max] box intersects the probe
    * on BOTH dimensions (exactly the parquet row-group skipping rule).
    * One-row summary — total vs scanned files and rows.
    */
  def pruneStats(files: DataFrame, xLo: Long, xHi: Long,
      yLo: Long, yHi: Long): DataFrame = {
    val hit = !(col("max_x") < xLo || col("min_x") > xHi ||
      col("max_y") < yLo || col("min_y") > yHi)
    files.agg(
      count(lit(1)).as("n_files"),
      sum(col("n_rows")).as("n_rows"),
      sum(when(hit, 1L).otherwise(0L)).as("files_scanned"),
      sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_scanned"))
  }
}
