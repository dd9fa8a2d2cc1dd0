package graft.parse

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MetaParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("metadata state machine: flat / level-1 / level-2 (parser.py:140-213)") {
    val (flat, nested, nested2) =
      MetaParser.processMetadata(graft.queries.ParseQueries.headerFixture)
    assert(flat("acceptance-datetime") == "20210301120000")
    assert(flat("description") == "Sample filing header")
    assert(flat("CONFORMED_SUBMISSION_TYPE") == "8-K")
    assert(flat("PUBLIC_DOCUMENT_COUNT") == "3")
    // level-1 data keys keep spaces (parser.py:198-203 does not replace)
    assert(nested("BUSINESS_ADDRESS")("STREET 1") == "100 MAIN ST")
    assert(nested("BUSINESS_ADDRESS")("CITY") == "SPRINGFIELD")
    // level-2 data keys are underscore-replaced (parser.py:206-211)
    assert(nested2("FILER")("COMPANY_DATA")("COMPANY_CONFORMED_NAME") == "ACME CORP")
    assert(nested2("FILER")("COMPANY_DATA")("CENTRAL_INDEX_KEY") == "0001000045")
    assert(nested2("FILER")("FILING_VALUES")("FORM_TYPE") == "8-K")
  }

  test("container splitter: 2 filings x embedded docs (parser.py:74-109)") {
    val docs = MetaParser.splitContainer("f.txt",
      graft.queries.ParseQueries.containerDoc)
    assert(docs.size == 2)
    assert(docs.map(_.secDocNum) == Seq(0, 1))
    assert(docs.head.documents.size == 2)
    assert(docs.head.documents.map(_.docType) == Seq("10-K", "EX-10"))
    assert(docs.head.documents.head.text == "Annual report body one.")
    assert(docs.head.flat("CONFORMED_SUBMISSION_TYPE") == "10-K")
    assert(docs(1).documents.map(_.filename) == Seq("current.txt"))
  }

  test("explodeContainers is a distributed generator (1 row -> N)") {
    import spark.implicits._
    val df = Seq(("a.txt", graft.queries.ParseQueries.containerDoc),
      ("b.txt", graft.queries.ParseQueries.containerDoc)).toDF("path", "content")
    val out = MetaParser.explodeContainers(df)
    assert(out.count() == 4)
    assert(out.filter(_.path == "a.txt").count() == 2)
  }

  test("uudecode round-trips the python-uu golden fixture (parser.py:117-125)") {
    val enc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(TestSpark.resource("uuencoded.txt"))))
    val expectedHex = "48656c6c6f2062696e61727920776f726c642120000102ff"
    val got = MetaParser.uudecode(enc)
    assert(got.map("%02x".format(_)).mkString == expectedHex)
    assert(MetaParser.isUuencoded(org.apache.spark.sql.functions.lit(enc)) != null)
  }

  test("document metadata extraction (parser.py:215-242)") {
    val (t, s, f) = MetaParser.processDocumentMetadata(
      "<TYPE>10-K\n<SEQUENCE>1\n<FILENAME>main.txt\n<TEXT>x</TEXT>")
    assert(t == "10-K" && s == "1" && f == "main.txt")
  }
}
