package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.EntryOps
import graft.sources.IndexReader

/** Golden-fixture tests over the reference's own master.idx
  * (`tests/data/filings/master/master.idx`: 20 data rows, 17 CIKs) and the
  * daily fixture (`master.20181231.idx`, yyyyMMdd dates).
  */
class EdgarFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quarterly master.idx parses 20 rows, headers dropped") {
    val df = IndexReader.read(spark, TestSpark.resource("master.idx"))
    assert(df.count() == 20)
    assert(df.select("cik").distinct().count() == 17)
    val disney = df.filter($"company_name" === "DISNEY WALT CO").head()
    assert(disney.getAs[String]("form_type") == "10-K")
    assert(disney.getAs[java.sql.Date]("date_filed").toString == "1993-12-22")
    assert(disney.getAs[String]("path") ==
      "Archives/edgar/data/29082/0000950131-94-000021.txt")
  }

  test("daily master.20181231.idx parses with yyyyMMdd dates") {
    val df = IndexReader.read(spark, TestSpark.resource("master.20181231.idx"))
    assert(df.count() > 0)
    assert(df.filter($"date_filed".isNull).count() == 0)
    assert(df.select(min($"date_filed")).head().getDate(0).toString == "2018-12-31")
  }

  test("running kept-count numbers filtered rows in file order (_index.py:160-178)") {
    val df = IndexReader.read(spark, TestSpark.resource("master.idx"))
      .filter($"form_type" === "10-K")
    val counted = EntryOps.withRunningCount(df, "line_no")
      .orderBy("num_previously_valid")
      .select("num_previously_valid", "company_name")
      .as[(Long, String)].collect()
    assert(counted.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(counted.head._2 == "DISNEY WALT CO") // first kept row in file order
  }

  test("era-dependent idx date format (daily.py:118-132)") {
    val df = Seq("1994-03-05", "1997-01-02", "1998-03-30", "1998-03-31", "2018-12-31")
      .toDF("s").select(EdgarFunctions.dailyIdxFilename(to_date($"s")).as("f"))
    assert(df.as[String].collect().toSeq == Seq(
      "master.030594.idx", "master.970102.idx", "master.980330.idx",
      "master.19980331.idx", "master.20181231.idx"))
    assert(EdgarFunctions.eraIdxDateStr(java.time.LocalDate.parse("1994-03-05")) == "030594")
    assert(EdgarFunctions.eraIdxDateStr(java.time.LocalDate.parse("1997-01-02")) == "970102")
    assert(EdgarFunctions.eraIdxDateStr(java.time.LocalDate.parse("2018-12-31")) == "20181231")
  }

  test("scalar ports: accession, clean path, zfill, digits, txt rewrite") {
    val r = Seq(("edgar/data/29082/0000950131-94-000021.txt",
        "Sierra Health, Services Inc.", "320193",
        "https://x/Archives/0000912057-21-000101-index.htm"))
      .toDF("fn", "name", "cik", "href")
      .select(
        EdgarFunctions.accessionNumber($"fn").as("a"),
        EdgarFunctions.cleanDirectoryPath($"name").as("c"),
        EdgarFunctions.cikZfill($"cik").as("z"),
        EdgarFunctions.isAllDigits($"cik").as("d"),
        EdgarFunctions.accessionToTxtUrl($"href").as("t"))
      .head()
    assert(r.getString(0) == "0000950131-94-000021.txt")
    assert(r.getString(1) == "Sierra_Health_Services_Inc")
    assert(r.getString(2) == "0000320193")
    assert(r.getBoolean(3))
    assert(r.getString(4) == "https://x/Archives/0000912057-21-000101.txt")
  }

  test("form-type domain: 804 values, validation + amend detection") {
    assert(graft.model.FilingType.values.size == 804)
    assert(graft.model.FilingType.isValid("10-K"))
    assert(graft.model.FilingType.isValid("10-K/A"))
    assert(!graft.model.FilingType.isValid("NOT-A-FORM"))
    assert(graft.model.FilingType.isAmend("10-K/A"))
    assert(!graft.model.FilingType.isAmend("10-K"))
  }

  test("idxExists probe (listings-directory analog, _index.py:133-143)") {
    assert(IndexReader.idxExists(spark, TestSpark.resource("master.idx")))
    assert(!IndexReader.idxExists(spark, "/nonexistent/master.idx"))
    assertThrows[IndexReader.EdgarQueryError](
      IndexReader.readStrict(spark, "/nonexistent/master.idx"))
  }
}
