package graft.fetch

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Attempt counter shared across local-mode tasks (single test JVM);
  * top-level so the fetch closure references the object rather than
  * capturing (and copying) a counter through closure serialization.
  */
object FetchAttempts extends Serializable {
  val n = new java.util.concurrent.atomic.AtomicInteger(0)
}

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
    assert(got(1).getAs[String]("error").contains("not found"))
    // classified structurally at the source, not by message text
    assert(!got(0).getAs[Boolean]("not_found"))
    assert(got(1).getAs[Boolean]("not_found"))
  }

  test("not-found is deterministic: fetched once, never retried, flagged " +
    "(404 is the pagination terminator, not a transient failure)") {
    FetchAttempts.n.set(0)
    val gone: Fetcher.FetchFn = url => {
      FetchAttempts.n.incrementAndGet()
      throw new Fetcher.NotFoundException(s"HTTP 404 for $url")
    }
    val work = Seq(("k", "u")).toDF("key", "url").coalesce(1)
    val got = Fetcher.fetchAll(work, gone, globalRate = 1000.0, retries = 3)
      .head()
    assert(FetchAttempts.n.get() == 1) // no retry budget burned on a 404
    assert(got.getAs[Boolean]("not_found"))
    assert(got.getAs[String]("error").contains("404"))
  }

  test("a transient error whose MESSAGE mentions FileNotFoundException is " +
    "still a hard error, not a not-found") {
    val spoof: Fetcher.FetchFn = _ => throw new RuntimeException(
      "wrapper: caused by java.io.FileNotFoundException deep in the chain")
    val work = Seq(("k", "u")).toDF("key", "url").coalesce(1)
    val got = Fetcher.fetchAll(work, spoof, globalRate = 1000.0, retries = 0)
      .head()
    assert(!got.getAs[Boolean]("not_found"))
    assert(got.getAs[String]("error").contains("FileNotFoundException"))
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
