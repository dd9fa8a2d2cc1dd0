package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UrlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("scheme/host lowering, www, default port, fragment, utm, slash") {
    assert(canon(
      "HTTPS://WWW.X.COM:443/a/b/?id=3&utm_source=f#frag",
      "https://x.com/a/b?id=3",
      "HTTP://www.X.com:80/a/b?id=3&utm_medium=e") == Seq(
      "https://x.com/a/b?id=3",
      "https://x.com/a/b?id=3",
      "http://x.com/a/b?id=3"))
  }

  test("edge shapes: bare host, root path, empty query, non-default port") {
    assert(canon(
      "https://x.com",          // no path at all
      "https://x.com/",         // root path stays "/"
      "https://x.com/a?",       // empty query dropped
      "https://x.com:8443/a",   // non-default port preserved
      "http://x.com:443/a") ==  // :443 is NOT http's default port
      Seq("https://x.com", "https://x.com/", "https://x.com/a",
        "https://x.com:8443/a", "http://x.com:443/a"))
  }

  test("path and query case preserved; param order preserved") {
    assert(canon("https://x.com/A/B?b=2&A=1") ==
      Seq("https://x.com/A/B?b=2&A=1"))
  }
}
