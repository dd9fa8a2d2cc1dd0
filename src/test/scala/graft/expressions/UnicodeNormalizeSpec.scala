package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

class UnicodeNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("NFC composes combining marks, jamo, and singletons; ascii is " +
    "identity") {
    val rows = Seq(
      (1L, "café"), (2L, "Å"), (3L, "각"),
      (4L, "Ω"), (5L, "ascii only"), (6L, "ẹ́"))
      .toDF("id", "txt")
      .select($"id", TextFunctions.normalizeUnicode($"txt").as("n"))
      .as[(Long, String)].collect().toMap
    assert(rows(1L) == "café")
    assert(rows(2L) == "Å")
    assert(rows(3L) == "각")
    assert(rows(4L) == "Ω")
    assert(rows(5L) == "ascii only")
    assert(rows(6L) == "ẹ́") // canonical reorder then compose
  }

  test("NFKC folds compatibility forms (ligature, fullwidth, superscript) " +
    "that NFC must preserve") {
    val src = Seq((1L, "ﬁle"), (2L, "ＡＢ"), (3L, "x²"))
      .toDF("id", "txt")
    val nfkc = src.select($"id",
      TextFunctions.normalizeUnicode($"txt", "NFKC").as("n"))
      .as[(Long, String)].collect().toMap
    val nfc = src.select($"id",
      TextFunctions.normalizeUnicode($"txt").as("n"))
      .as[(Long, String)].collect().toMap
    assert(nfkc == Map(1L -> "file", 2L -> "AB", 3L -> "x2"))
    assert(nfc == Map(1L -> "ﬁle", 2L -> "ＡＢ", 3L -> "x²"))
  }

  test("NFD decomposes what NFC composes (round trip)") {
    val s = "café 각"
    val nfd = Seq(Tuple1(s)).toDF("txt")
      .select(TextFunctions.normalizeUnicode($"txt", "NFD").as("n"))
      .as[String].head()
    assert(nfd == "café 각")
    val back = Seq(Tuple1(nfd)).toDF("txt")
      .select(TextFunctions.normalizeUnicode($"txt").as("n"))
      .as[String].head()
    assert(back == s)
  }

  test("already-normalized fast path returns the input object (no alloc); " +
    "null propagates; codegen matches interpreted eval") {
    val in = UTF8String.fromString("already normal")
    assert(UnicodeNormalize.normalize(in, Normalizer.Form.NFC) eq in)
    val rows = Seq((1L, "á"), (2L, null: String)).toDF("id", "txt")
      .select($"id", TextFunctions.normalizeUnicode($"txt").as("n"))
      .collect()
    assert(rows.find(_.getLong(0) == 2L).exists(_.isNullAt(1)))
    val interp = UnicodeNormalize(Literal(UTF8String.fromString("á"),
      org.apache.spark.sql.types.StringType), "NFC")
      .eval(null).asInstanceOf[UTF8String].toString
    assert(interp == "á")
    assert(rows.find(_.getLong(0) == 1L).exists(_.getString(1) == interp))
  }

  test("normalization collapses byte-variant duplicates for exact dedup") {
    val docs = Seq((1L, "café menu"), (2L, "café menu"))
      .toDF("doc_id", "text")
    val distinctRaw = docs.select("text").distinct().count()
    val distinctNorm = docs
      .select(TextFunctions.normalizeUnicode($"text").as("t"))
      .distinct().count()
    assert(distinctRaw == 2L && distinctNorm == 1L)
  }
}
