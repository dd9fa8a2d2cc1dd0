package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

class DeflateRatioSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetitive text compresses far below word-diverse text, and the " +
    "ratio orders them") {
    val docs = Seq(
      (1L, Seq.fill(200)("spam").mkString(" ")),
      (2L, (0 until 200).map(i => s"w${i * 7919 % 100000}").mkString(" ")))
      .toDF("doc_id", "text")
    val r = docs.select($"doc_id",
      TextFunctions.compressionRatio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(r(1L) < 0.1, s"boilerplate ratio ${r(1L)} should be tiny")
    assert(r(2L) > 2 * r(1L), s"diverse ${r(2L)} vs repetitive ${r(1L)}")
    assert(r.values.forall(v => v > 0.0 && v < 1.5))
  }

  test("empty string defines to 1.0; null propagates null") {
    val rows = Seq((1L, ""), (2L, null: String), (3L, "abc"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.compressionRatio($"text").as("r"))
      .collect().map(row =>
        row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getDouble(1))))
      .toMap
    assert(rows(1L) == Some(1.0))
    assert(rows(2L).isEmpty)
    assert(rows(3L).exists(_ > 0.0))
  }

  test("codegen path is bitwise identical to interpreted eval, and stable " +
    "across partitionings") {
    val texts = (0 until 300).map(i =>
      ((i * 31) to (i * 31 + 40)).map(j => s"t${j % (3 + i % 37)}")
        .mkString(" "))
    // interpreted: direct expression eval on the driver
    val interp = texts.map(t =>
      DeflateRatio(Literal(UTF8String.fromString(t),
        org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[Double])
    for (parts <- Seq(1, 7)) {
      val viaSpark = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text").repartition(parts)
        .select($"id", TextFunctions.compressionRatio($"text").as("r"))
        .as[(Long, Double)].collect().sortBy(_._1).map(_._2)
      assert(viaSpark.toSeq == interp, s"parts=$parts diverged")
    }
  }

  test("storedLen: the real level-0 codec output equals the stored-block " +
    "closed form n + 5*max(1, ceil(n/65535)) — empty, single-block, " +
    "boundary, and multi-block inputs; codegen path agrees; null " +
    "propagates") {
    def formula(n: Long): Long = n + 5L * math.max(1L, (n + 65534) / 65535)
    // multi-byte chars make utf8 n_bytes != string length — the formula
    // is over BYTES, which is what the expression must extract
    val texts = Seq("", "a", "héllo wörld", "x" * 553, "y" * 65535,
      "z" * 65536, "w" * 200000, (0 until 500).map(i => s"t$i").mkString(" "))
    texts.foreach { t =>
      val n = t.getBytes("UTF-8").length.toLong
      val got = DeflateRatio.storedLen(UTF8String.fromString(t))
      assert(got == formula(n), s"len-${t.length}: $got vs ${formula(n)}")
    }
    val viaSpark = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(3)
      .select($"id", TextFunctions.deflateStoredLen($"text").as("l"))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
    assert(viaSpark == texts.map(t => formula(t.getBytes("UTF-8").length.toLong)))
    val withNull = Seq((1L, "abc"), (2L, null: String)).toDF("id", "text")
      .select($"id", TextFunctions.deflateStoredLen($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!withNull(1L) && withNull(2L))
  }
}
