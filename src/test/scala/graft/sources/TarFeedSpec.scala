package graft.sources

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.ParseQueries

/** Bulk tar feed scan (`core/_index.py:215-304`, `core/daily.py:108-116`). */
class TarFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("feed")
    Files.write(dir.resolve("19940103.nc.tar.gz"),
      ParseQueries.buildTarGz(ParseQueries.feedTarMembers))
    dir.toString
  }

  test("untar round-trip: every member comes back byte-exact") {
    val got = TarFeedReader.untar(
      ParseQueries.buildTarGz(ParseQueries.feedTarMembers))
      .map { case (n, b) => (n, new String(b, "UTF-8")) }.toSeq
    assert(got == ParseQueries.feedTarMembers
      .map { case (n, b) => (n, new String(b, "UTF-8")) })
  }

  test("binaryFile scan + member-ending resolution: .nc wins over .corr, " +
    "stray members dropped (_index.py:291-303)") {
    val members = TarFeedReader.readTarMembers(spark,
      writeFixture() + "/*.nc.tar.gz")
    assert(members.count() == 4)
    val resolved = TarFeedReader.resolveMembers(members)
      .select("accession_number", "ending")
      .as[(String, String)].collect().toMap
    assert(resolved == Map(
      "0000950131-94-000021" -> "nc",
      "0000912057-94-000123" -> "corr02"))
  }

  test("rekey joins the day's entries and PatternSink lays out the " +
    "{cik}/{accession} tree (_move_to_dest analog)") {
    val members = TarFeedReader.readTarMembers(spark,
      writeFixture() + "/*.nc.tar.gz")
    val entries = Seq(
      ("29082", "edgar/data/29082/0000950131-94-000021.txt"),
      ("912057", "edgar/data/912057/0000912057-94-000123.txt"))
      .toDF("cik", "file_name")
    val rekeyed = TarFeedReader.rekey(
      TarFeedReader.resolveMembers(members), entries)
    val out = Files.createTempDirectory("feedtree").toString
    graft.sink.PatternSink.writeExact(rekeyed, out,
      dirPattern = "{cik}", filePattern = "{accession_number}")
    val kept = Paths.get(out, "29082", "0000950131-94-000021.txt")
    assert(Files.exists(kept))
    assert(new String(Files.readAllBytes(kept)) ==
      "<SEC-DOCUMENT>doc A nc</SEC-DOCUMENT>")
    assert(Files.exists(
      Paths.get(out, "912057", "0000912057-94-000123.txt")))
  }

  test("feed members compose with the SGML parser: untarred .nc payloads " +
    "explode into SEC-DOCUMENT rows") {
    val container = graft.queries.ParseQueries.containerDoc
    val dir = Files.createTempDirectory("feedparse")
    Files.write(dir.resolve("19940104.nc.tar.gz"),
      graft.queries.ParseQueries.buildTarGz(Seq(
        "0000912057-94-000001.nc" -> container.getBytes("UTF-8"))))
    val members = TarFeedReader.readTarMembers(spark,
      dir.toString + "/*.nc.tar.gz")
    val parsed = graft.parse.MetaParser.explodeContainers(
      members.select(col("member_name").as("path"),
        col("content").cast("string").as("content")))
    val rows = parsed.collect()
    assert(rows.map(_.secDocNum).sorted.toSeq == Seq(0, 1))
    assert(rows.flatMap(_.documents).map(_.docType).sorted.toSeq ==
      Seq("10-K", "8-K", "EX-10"))
  }

  test("quarterly feed discovery scrapes nc.tar.gz hrefs from the " +
    "directory listing (quarterly.py:95-99)") {
    val listing =
      """<html><body><table>
        |<tr><td><a href="19940103.nc.tar.gz">19940103.nc.tar.gz</a></td></tr>
        |<tr><td><a href='19940104.nc.tar.gz'>19940104.nc.tar.gz</a></td></tr>
        |<tr><td><a href="sitemap.xml">sitemap</a></td></tr>
        |<tr><td><a href="19940105.idx">19940105.idx</a></td></tr>
        |</table></body></html>""".stripMargin
    assert(TarFeedReader.quarterlyTarUrls(listing) ==
      Seq("19940103.nc.tar.gz", "19940104.nc.tar.gz"))
  }

  test("feed availability floor: before 1995 Q3 raises (daily.py:110-112)") {
    intercept[IllegalArgumentException] {
      TarFeedReader.dailyTarUrl(LocalDate.of(1995, 6, 30))
    }
    assert(TarFeedReader.dailyTarUrl(LocalDate.of(1995, 7, 3)) ==
      "Archives/edgar/Feed/1995/QTR3/19950703.nc.tar.gz")
  }
}
