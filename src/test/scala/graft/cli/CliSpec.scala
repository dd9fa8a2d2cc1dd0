package graft.cli

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api.Filings
import graft.queries.ParseQueries

/** Argument-vector semantics per `secedgar/cli.py:1-126`, pinned by the
  * reference's `secedgar/tests/test_cli.py` cases.
  */
class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val ua = "My User Agent (email@example.com)"
  private def argv(input: String, dir: String = "/tmp/out"): Seq[String] =
    Seq("--user-agent", ua) ++ input.split("\\s+").toSeq ++
      Seq("--directory", dir)

  // --- bad inputs (test_cli.py::test_cli_filing_bad_inputs) ---------------

  test("missing filing type is a usage error (SystemExit analog)") {
    assertThrows[Cli.UsageError] {
      Cli.parse(argv("filing -l aapl msft Facebook"))
    }
  }

  test("unrecognized filing type raises FilingTypeError") {
    assertThrows[Cli.FilingTypeError] {
      Cli.parse(argv("filing -l aapl -t null"))
    }
  }

  test("non-integer count is a usage error") {
    assertThrows[Cli.UsageError] {
      Cli.parse(argv("filing -l aapl -t FILING_10Q -n abc"))
    }
  }

  test("count of 0 raises ValueError analog") {
    assertThrows[IllegalArgumentException] {
      Cli.parse(argv("filing -l aapl -t FILING_10Q -n 0"))
    }
  }

  test("daily without a date is a usage error; malformed date raises " +
    "ValueError analog (test_cli.py::test_cli_daily_bad_inputs)") {
    assertThrows[Cli.UsageError] { Cli.parse(argv("daily")) }
    assertThrows[IllegalArgumentException] { Cli.parse(argv("daily -d 2020")) }
  }

  test("user agent is required for every command " +
    "(test_cli.py::test_cli_requires_user_agent)") {
    assertThrows[Cli.UsageError] {
      Cli.parse("daily -d 20201113 --directory /tmp/x".split(" ").toSeq)
    }
    assertThrows[Cli.UsageError] {
      Cli.parse("filing -l aapl -t FILING_10Q".split(" ").toSeq)
    }
  }

  // --- good vectors compile to the right query ----------------------------

  test("filing vector compiles to CompanyQuery with enum-mapped type, " +
    "dates, count (cli.py:97-104)") {
    val q = Cli.toQuery(Cli.parse(argv(
      "filing -l 0001000045 -l 0001000120 -t FILING_10Q " +
        "-s 20210101 -e 20211231 -n 10")))
    val cq = q.asInstanceOf[Filings.CompanyQuery]
    assert(cq.lookups == Seq("0001000045", "0001000120"))
    assert(cq.filingType.contains("10-Q"))
    assert(cq.count.contains(10))
    assert(cq.startDate.contains(java.time.LocalDate.of(2021, 1, 1)))
    assert(cq.endDate.contains(java.time.LocalDate.of(2021, 12, 31)))
  }

  test("FILING_* names map through the reference enum inventory " +
    "(non-algorithmic cases included)") {
    def ft(n: String) = Cli.toQuery(Cli.parse(argv(s"filing -l 1 -t $n")))
      .asInstanceOf[Filings.CompanyQuery].filingType.get
    assert(ft("FILING_10K") == "10-K")
    assert(ft("FILING_10K_AMEND") == "10-K/A")
    assert(ft("FILING_DEF14A") == "DEF 14A") // vs FILING_DEF_14A = 'def 14a'
    assert(ft("FILING_DEF_14A") == "def 14a")
    assert(ft("FILING_SC13DA") == "sc 13d/a")
  }

  test("filing command yields the same entries DataFrame as the " +
    "CompanyQuery API over a mirrored root") {
    val viaCli = Cli.run(argv(
      "filing -l 0001000045 -l 0001000120 -l 0001000200 " +
        "-t FILING_10Q -n 3"),
      spark, ParseQueries.companyMirrorDir)
      .select("cik", "txt_url").collect().map(_.toSeq).toSet
    val viaApi = Filings.CompanyQuery(
      lookups = Seq("0001000045", "0001000120", "0001000200"),
      filingType = Some("10-Q"), count = Some(3),
      startDate = None, endDate = None)
      .entries(spark, ParseQueries.companyMirrorDir)
      .select("cik", "txt_url").collect().map(_.toSeq).toSet
    assert(viaCli == viaApi)
    assert(viaCli.nonEmpty)
  }

  test("daily command reads the date's master idx over a mirrored root " +
    "(cli.py:118-126)") {
    val root = java.nio.file.Files.createTempDirectory("cli_daily")
    val qdir = root.resolve("daily-index/2018/QTR4")
    java.nio.file.Files.createDirectories(qdir)
    val golden = getClass.getResourceAsStream("/golden/master.20181231.idx")
    java.nio.file.Files.copy(golden, qdir.resolve("master.20181231.idx"))
    val got = Cli.run(argv("daily -d 20181231"), spark, root.toString)
    assert(got.count() > 0)
    assert(got.columns.contains("cik"))
  }

  test("unknown leading token is a usage error") {
    assertThrows[Cli.UsageError] {
      Cli.parse(Seq("--user-agent", ua, "frobnicate"))
    }
  }
}
