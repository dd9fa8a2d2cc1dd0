package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.IndexReader

class PatternSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def entries = IndexReader.read(spark, TestSpark.resource("master.idx"))
    .withColumn("content", concat(lit("payload for "), col("cik")))

  test("exact tier reproduces {year}/QTR{quarter}/{cik} layout " +
    "(quarterly.py:101-134, test_quarterly.py:79-92)") {
    val dir = Files.createTempDirectory("sink").toString
    PatternSink.writeExact(entries, dir,
      dirPattern = "{year}/QTR{quarter}/{cik}")
    val disney = Paths.get(dir, "1993/QTR4/29082", "0000950131-94-000021.txt")
    assert(Files.exists(disney), s"missing $disney")
    assert(new String(Files.readAllBytes(disney)) == "payload for 29082")
  }

  test("date pattern + default accession filename (daily.py:134-166)") {
    val dir = Files.createTempDirectory("sink2").toString
    PatternSink.writeExact(entries, dir, dirPattern = "{date}/{cik}")
    assert(Files.exists(Paths.get(dir, "19931222/29082",
      "0000950131-94-000021.txt")))
  }

  test("analytic tier partitions by (year, quarter, cik) for pruning") {
    val dir = Files.createTempDirectory("sink3").toString + "/t"
    PatternSink.writeAnalytic(entries, dir)
    val read = spark.read.parquet(dir)
    assert(read.count() == 20)
    // partition pruning: filter on partition cols must prune the scan
    val pruned = read.filter($"year" === 1993 && $"cik" === "29082")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 1)
    assert(Files.exists(Paths.get(dir, "year=1993/quarter=4/cik=29082")))
  }
}
