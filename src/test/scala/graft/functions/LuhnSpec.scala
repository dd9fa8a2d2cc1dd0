package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Luhn card-detection tier: the hand-rolled integer checksum must agree
  * with Spark's builtin `luhn_check` on every digit string (the builtin
  * is the independent implementation; ours exists to expose the integer
  * sum as oracle evidence), and the candidate regex must respect digit-run
  * boundaries.
  */
class LuhnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("luhnSum mod 10 agrees with builtin luhn_check on 500 digit strings") {
    // deterministic battery: md5-derived digit strings of lengths 1..20
    val df = spark.range(500)
      .select(col("id"), regexp_replace(md5(concat(lit("luhn"),
        col("id").cast("string"))), "[a-f]", "").as("ds"))
      .select(col("ds").substr(lit(1), (col("id") % 20 + 1).cast("int")).as("d"))
      .filter(length(col("d")) > 0)
    val disagree = df.select(
        (TextFunctions.luhnSum(col("d")) % 10 === 0).as("ours"),
        expr("luhn_check(d)").as("builtin"))
      .filter(col("ours") =!= col("builtin"))
    assert(disagree.count() == 0)
  }

  test("known card test numbers validate; off-by-one and order ids fail") {
    val rows = Seq(
      ("4111111111111111", true), ("5555555555554444", true),
      ("4012888888881881", true), ("378282246310005", true),
      ("6011111111111117", true), ("4111111111111112", false),
      ("1234567890123456", false)).toDF("d", "expected")
    val bad = rows.filter(
      TextFunctions.luhnValid(col("d")) =!= col("expected"))
    assert(bad.count() == 0)
  }

  test("candidate regex: 13-19 digit runs only, no partial match of longer runs") {
    val rows = Seq(
      ("a 1234567890123 b", 1),       // 13 digits: candidate
      ("a 123456789012 b", 0),        // 12: too short
      ("a 12345678901234567890 b", 0), // 20: boundary blocks partial match
      ("a 4111 1111 1111 1111 b", 1), // spaced grouping
      ("a 5555-5555-5555-4444 b", 1)) // dashed grouping
      .toDF("text", "n")
    val bad = rows.filter(
      size(TextFunctions.cardCandidates(col("text"))) =!= col("n"))
    assert(bad.count() == 0)
  }

  test("scrubCards redacts only Luhn-valid candidates") {
    val out = Seq(
      "pay 4111 1111 1111 1111 or 5555-5555-5555-4444 now",
      "order id 1234567890123456 shipped to 4012888888881881",
      "call 555-123-4567, no cards")
      .toDF("text")
      .select(TextFunctions.scrubCards(col("text")).as("s"))
      .as[String].collect()
    assert(out(0) == "pay <CARD> or <CARD> now")
    assert(out(1) == "order id 1234567890123456 shipped to <CARD>")
    assert(out(2) == "call 555-123-4567, no cards")
  }
}
