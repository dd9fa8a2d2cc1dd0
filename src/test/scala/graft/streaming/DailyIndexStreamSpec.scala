package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DailyIndexStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("idx files landing in a directory stream through parse + aggregate") {
    val dir = Files.createTempDirectory("stream").toString
    // first day lands
    Files.copy(Paths.get(TestSpark.resource("master.20181231.idx")),
      Paths.get(dir, "master.20181231.idx"))
    val entries = DailyIndexStream.entries(spark, dir)
    assert(entries.isStreaming)
    val q = DailyIndexStream.dailyFormCounts(entries)
      .writeStream.format("memory").queryName("daily_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n1 = spark.sql("SELECT sum(n) FROM daily_counts").head().getLong(0)
      assert(n1 > 0)
      // a second file lands -> incremental micro-batch picks it up
      Files.copy(Paths.get(TestSpark.resource("master.idx")),
        Paths.get(dir, "master.idx"))
      q.processAllAvailable()
      val n2 = spark.sql("SELECT sum(n) FROM daily_counts").head().getLong(0)
      assert(n2 == n1 + 20, s"expected ${n1 + 20}, got $n2")
    } finally q.stop()
  }
}
