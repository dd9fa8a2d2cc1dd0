package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Size-tiered materialization: the local tier is the default, the
  * reliable tier fires only past the MEASURED-size threshold, and both
  * tiers return the same rows eagerly.
  */
class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("below threshold: local tier, rows intact, lineage truncated") {
    val df = (1L to 500L).map(i => (i, s"row $i")).toDF("id", "s")
    val out = Materialize.eager(df)
    assert(out.queryExecution.analyzed.collectFirst {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
    }.contains(true), "must be checkpoint-rooted (lineage truncated)")
    assert(out.as[(Long, String)].collect().toSet ==
      (1L to 500L).map(i => (i, s"row $i")).toSet)
  }

  test("past the measured threshold: promoted to a RELIABLE checkpoint " +
      "(files on disk survive executor loss), same rows") {
    val key = "spark.graft.localCheckpoint.maxBytes"
    val keyP = "spark.graft.localCheckpoint.measureMinPartitions"
    val prev = spark.conf.getOption(key)
    val prevP = spark.conf.getOption(keyP)
    spark.conf.set(key, "1") // any measured frame exceeds 1 byte
    spark.conf.set(keyP, "0") // tiny test frame: force the measurement
    try {
      val df = (1L to 500L).map(i => (i, s"row $i")).toDF("id", "s")
      val out = Materialize.eager(df)
      assert(out.as[(Long, String)].collect().toSet ==
        (1L to 500L).map(i => (i, s"row $i")).toSet)
      val dir = spark.sparkContext.getCheckpointDir
      assert(dir.nonEmpty, "reliable tier must set a checkpoint dir")
      val files = new java.io.File(new java.net.URI(dir.get))
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
      assert(anyFile(files), "reliable checkpoint left no files on disk")
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      prevP.fold(spark.conf.unset(keyP))(spark.conf.set(keyP, _))
    }
  }

  test("threshold -1 pins the local tier unconditionally") {
    val key = "spark.graft.localCheckpoint.maxBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try {
      val df = (1L to 100L).map(i => (i, i * 2)).toDF("a", "b")
      val out = Materialize.eager(df)
      assert(out.as[(Long, Long)].collect().toSet ==
        (1L to 100L).map(i => (i, i * 2)).toSet)
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }
}
