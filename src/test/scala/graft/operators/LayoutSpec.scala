package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Z-order layout: the Morton key must match a reference bit-interleave,
  * clusterByZ files must cover disjoint z-ranges, and min/max pruning
  * must never skip a file that contains probe rows (soundness).
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave on a 32x32 grid") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val df = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue(col("x"), col("y"), 5).as("z"))
    val bad = df.collect().filter { r =>
      r.getLong(2) != mortonRef(r.getLong(0), r.getLong(1), 5)
    }
    assert(bad.isEmpty)
    // the curve is a bijection on the grid
    assert(df.select("z").distinct().count() == 32 * 32)
  }

  test("clusterByZ partitions cover disjoint z-ranges") {
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val ranges = Layout.clusterByZ(pts, "x", "y", bits = 6, numFiles = 8)
      .select(spark_partition_id().as("pid"), col("__z"))
      .groupBy("pid").agg(min("__z").as("lo"), max("__z").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("pruning is sound: every file holding probe rows is scanned") {
    val pts = (for (x <- 0L until 128L; y <- 0L until 128L) yield (x, y))
      .toDF("x", "y")
    val (xLo, xHi, yLo, yHi) = (10L, 40L, 90L, 120L)
    val files = Layout.zLayoutFiles(pts, "x", "y", bits = 7, filePrefixBits = 6)
    val stats = Layout.pruneStats(files, xLo, xHi, yLo, yHi).collect().head
    val trueRows = pts.filter(col("x").between(xLo, xHi) &&
      col("y").between(yLo, yHi)).count()
    assert(stats.getAs[Long]("rows_scanned") >= trueRows)
    assert(stats.getAs[Long]("files_scanned") <= stats.getAs[Long]("n_files"))
    // and it actually skips something on this grid
    assert(stats.getAs[Long]("files_scanned") < stats.getAs[Long]("n_files"))
  }
}
