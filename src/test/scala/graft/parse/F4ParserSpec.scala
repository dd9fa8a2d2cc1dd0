package graft.parse

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class F4ParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parity mode extracts both transactions (parser.py:254-339)") {
    val txs = F4Parser.process(graft.queries.ParseQueries.form4Doc)
    assert(txs.size == 2)
    val t1 = txs.head
    assert(t1.securityTitle == "Common Stock")
    assert(t1.transactionDate == "2021-03-01")
    assert(t1.transactionCode == "P")
    assert(t1.transactionShares == "100.0000")
    assert(t1.transactionPricePerShare == "12.3400")
    assert(t1.transactionAcquiredDisposedCode == "A")
    assert(t1.sharesOwnedFollowingTransaction == "500.0000")
    assert(t1.directOrIndirectOwnership == "D")
    assert(txs(1).transactionCode == "S")
  }

  test("non-Form-4 documents raise FilingTypeError (parser.py:267,338-339)") {
    assertThrows[F4Parser.FilingTypeError](
      F4Parser.process("<TYPE>10-K\n<FILENAME>x\n<TEXT>y</TEXT>"))
  }

  test("positional zip truncates on asymmetric docs (parser.py:322-333 fragility)") {
    // second transaction lacks transactionCode: the code stream has 1
    // entry, so zip yields exactly 1 transaction (silent truncation —
    // reproduced for parity; from_xml mode is the structurally safe path)
    val doc = graft.queries.ParseQueries.form4Doc
      .replaceAll("(?s)<transactionCode>S</transactionCode>", "")
    val txs = F4Parser.transactionsParity(doc)
    assert(txs.size == 1)
    assert(txs.head.transactionCode == "P")
  }

  test("relational from_xml mode parses typed transactions") {
    import spark.implicits._
    val df = Seq(graft.queries.ParseQueries.form4Doc).toDF("doc")
    val txs = F4Parser.transactionsFromXml(df, "doc")
      .orderBy("transaction_date").collect()
    assert(txs.length == 2)
    assert(txs(0).getAs[String]("security_title") == "Common Stock")
    assert(txs(0).getAs[java.sql.Date]("transaction_date").toString == "2021-03-01")
    assert(txs(0).getAs[java.math.BigDecimal]("transaction_shares")
      .compareTo(new java.math.BigDecimal("100")) == 0)
    assert(txs(1).getAs[String]("transaction_acquired_disposed_code") == "D")
  }
}
