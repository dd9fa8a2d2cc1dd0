package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.EntryOps

/** CIK HTML-scrape fallback against the reference's own golden pages
  * (`tests/data/CIK`; semantics per `cik_lookup.py:107-174` and
  * `tests/test_cik_lookup.py:60-145`).
  */
class CikScraperSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def page(name: String): String =
    new String(Files.readAllBytes(Paths.get(TestSpark.resource(name))))

  test("single result page yields the companyName anchor's CIK " +
    "(cik_lookup.py:144-146)") {
    assert(CikScraper.scrape(page("single_cik_search_result.html")) ==
      CikScraper.Single("0000320193"))
  }

  test("multiple-results page yields the candidate company names " +
    "(warn-and-skip branch, cik_lookup.py:147-152,157-170)") {
    CikScraper.scrape(page("cik_multiple_results.html")) match {
      case CikScraper.Multiple(names) =>
        assert(names.size == 40)
        assert(names.contains("Paper Boy-AAT Ltd Liability Co"))
        // nested strings inside the cell concatenate, exactly like the
        // reference's ''.join(td.find_all(string=True))
        assert(names.exists(_.startsWith("PAPER WAREHOUSE INCSIC: 5940")))
      case other => fail(s"expected Multiple, got $other")
    }
  }

  test("no-result page is NotFound (EDGARQueryError analog, " +
    "cik_lookup.py:171-174)") {
    assert(CikScraper.scrape(page("cik_not_found.html")) ==
      CikScraper.NotFound)
  }

  test("resolveCiksWithFallback precedence: digits bypass, map hits " +
    "bypass, misses scrape, multiple/none skip " +
    "(test_cik_lookup.py:60-80,119-128)") {
    val cikMap = Seq(("320193", "AAPL", "APPLE INC."))
      .toDF("cik", "ticker", "title")
    val lookups = Seq("AAPL", "1018724", "Apple Computer", "paper",
      "0notvalid0").toDF("lookup")
    val pages = Map(
      "mem://cik/Apple Computer" -> page("single_cik_search_result.html"),
      "mem://cik/paper" -> page("cik_multiple_results.html"),
      "mem://cik/0notvalid0" -> page("cik_not_found.html"))
    val fetch: graft.fetch.Fetcher.FetchFn = url =>
      pages.get(url) match {
        case Some(p) => p.getBytes("UTF-8")
        case None => throw new graft.fetch.Fetcher.NotFoundException(url)
      }
    val got = EntryOps.resolveCiksWithFallback(lookups, cikMap, fetch,
      l => s"mem://cik/$l", globalRate = 1e6)
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "AAPL" -> "320193", // ticker map, no fetch
      "1018724" -> "1018724", // all-digits passthrough, no fetch
      "Apple Computer" -> "0000320193")) // scraped single result
    // 'paper' (multiple) and '0notvalid0' (none) are skipped
  }
}
