package graft.fetch

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FetchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rate limiter: measured rate stays at or under the limit " +
    "(tests/test_client.py:178-195 analog)") {
    for (rate <- Seq(20.0, 50.0)) {
      val limiter = new RateLimiter(rate)
      val n = (rate * 2).toInt // ~2 seconds of requests
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => limiter.acquire())
      val elapsed = (System.nanoTime() - t0) / 1e9
      val achieved = (n - rate) / elapsed // burst capacity excluded
      assert(achieved <= rate * 1.1,
        s"achieved $achieved req/s exceeds limit $rate")
    }
  }

  test("fetchAll: local fetch + per-URL error quarantine (client.py:154-177)") {
    val dir = Files.createTempDirectory("fetch").toFile
    val ok = new java.io.File(dir, "a.txt")
    Files.write(ok.toPath, "hello".getBytes)
    val work = Seq(("k1", ok.getAbsolutePath), ("k2", "/nonexistent/b.txt"))
      .toDF("key", "url")
    val got = Fetcher.fetchAll(work, Fetcher.local, globalRate = 1000.0)
      .orderBy("key").collect()
    assert(new String(got(0).getAs[Array[Byte]]("content")) == "hello")
    assert(got(0).getAs[String]("error") == null)
    assert(got(1).getAs[Array[Byte]]("content") == null)
    assert(got(1).getAs[String]("error").contains("NoSuchFile"))
  }

  test("fetchAll retries transient failures") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky: Fetcher.FetchFn = _ => {
      if (attempts.incrementAndGet() < 3) throw new RuntimeException("transient")
      "recovered".getBytes
    }
    // single partition, single JVM (local mode) so the counter is shared
    val work = Seq(("k", "u")).toDF("key", "url").coalesce(1)
    val got = Fetcher.fetchAll(work, flaky, globalRate = 1000.0, retries = 3)
      .head()
    assert(new String(got.getAs[Array[Byte]]("content")) == "recovered")
  }
}
