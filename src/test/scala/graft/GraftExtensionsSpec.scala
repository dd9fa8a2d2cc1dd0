package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("float_dot is callable from SQL in a session built with " +
    "GraftExtensions") {
    // force TestSpark's session up first so the extension session piggy-
    // backs on the same SparkContext instead of racing for local ports;
    // getOrCreate only applies extensions when building a NEW session, so
    // clear the active/default handles around it and restore after
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val d = spark.sql(
        """SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
          |""".stripMargin).head().getDouble(0)
      assert(d == 11.0)
      val sh = spark.sql("SELECT word_shingles('a b c d', 3) AS s")
        .head().getSeq[String](0)
      assert(sh == Seq("a b c", "b c d"))
      val hk = spark.sql(
        """SELECT hyperplane_key(array(CAST(0.5 AS FLOAT)), 4, 0) AS k""")
        .head().getLong(0)
      assert(hk >= 0L && hk < 16L)
      val dr = spark.sql(
        "SELECT deflate_ratio('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS r")
        .head().getDouble(0)
      assert(dr > 0.0 && dr < 0.5)
      val gh = spark.sql("SELECT gram_hashes('abcd', 3) AS g")
        .head().getSeq[Long](0)
      assert(gh.length == 2) // 'abc', 'bcd'
      val wg = spark.sql(
        "SELECT word_gram_md5('one two three four', 2, 3) AS g")
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(wg.map(_.getInt(0)) == Seq(2, 2, 2, 3, 3)) // 3 bigrams + 2 trigrams
      assert(wg.forall(r => r.getLong(1) >= 0L && r.getLong(1) < (1L << 52)))
      assert(wg.head.getLong(2) == 7L) // length("one two")
      val ws = spark.sql(
        "SELECT word_gram_rep_stats('a b a b a b', 2) AS s")
        .head().getSeq[org.apache.spark.sql.Row](0)
      // 5 bigrams: "a b"×3 (topchars 3·3=9), "b a"×2; dup = 9 + 2·3
      assert(ws.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))) ==
        Seq((2, 9L, 15L)))
      val wr = spark.sql(
        "SELECT word_rep_stats('a b a b a') AS r").head().getStruct(0)
      // 5 words / 2 distinct; bigrams "a b"x2, "b a"x2 -> top 2 of 4
      assert(wr.toSeq == Seq(5L, 2L, 2L, 4L))
      val lr = spark.sql(
        "SELECT line_rep_stats('x\ny\nx') AS r").head().getStruct(0)
      // 3 lines / 2 distinct, dup chars 1 ("x" repeat), tot 3; 1 para
      assert(lr.toSeq == Seq(3L, 2L, 1L, 3L, 1L, 1L, 0L, 5L))
      val mph = spark.sql(
        "SELECT multi_pattern_hits('ab bab ba', 'ab', 'ba') AS h")
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(mph == Seq((0L, 1L, 2L), (1L, 4L, 2L)))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
