package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[graft.expressions.MultiPatternHits]] parity: the single-pass
  * Aho–Corasick scan must agree EXACTLY with the per-pattern
  * replace-count reference (`n_hits = (len − len(replace))/len(p)`,
  * `first_pos = instr`) — the same arithmetic the DuckDB oracle runs —
  * on randomized small-alphabet texts where overlaps, substring
  * patterns, and self-overlapping patterns all occur constantly.
  */
class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Greedy left-to-right non-overlapping count + 1-based first pos. */
  private def reference(text: String, p: String): (Long, Long) = {
    var i = 0; var n = 0L; var first = 0L
    while (i <= text.length - p.length) {
      if (text.regionMatches(i, p, 0, p.length)) {
        n += 1; if (first == 0L) first = i + 1L; i += p.length
      } else i += 1
    }
    (first, n)
  }

  test("automaton matches replace-count reference on adversarial cases") {
    val pats = Seq("aa", "aba", "a", "bb", "ab b", "b")
    val texts = Seq("", "a", "aaaa", "abababa", "ab bab baa", "bbbbb",
      "xyz", "aab baab b", "a b a b", "ab ba ab ba")
    for (t <- texts) {
      val got = Blocklist.hits(
        Seq((1L, t)).toDF("id", "text"), "id", "text", pats)
        .select("pid", "first_pos", "n_hits")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      pats.zipWithIndex.foreach { case (p, pid) =>
        val (first, n) = reference(t, p)
        val g = got.getOrElse(pid.toLong, (0L, 0L))
        assert(g == ((first, n)), s"text='$t' pattern='$p': got $g, " +
          s"want ($first, $n)")
      }
    }
  }

  test("automaton matches reference on 200 random small-alphabet texts") {
    val rnd = new scala.util.Random(42)
    val pats = Seq("ab", "ba", "aab", "abab", "b", "aa a")
    val rows = (0 until 200).map { i =>
      val len = 1 + rnd.nextInt(60)
      (i.toLong, (0 until len).map(_ => "ab "(rnd.nextInt(3))).mkString)
    }
    val got = Blocklist.hits(rows.toDF("id", "text"), "id", "text", pats)
      .select("id", "pid", "first_pos", "n_hits")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    for ((id, t) <- rows; (p, pid) <- pats.zipWithIndex) {
      val (first, n) = reference(t, p)
      val g = got.getOrElse((id, pid.toLong), (0L, 0L))
      assert(g == ((first, n)),
        s"text='$t' pattern='$p': got $g, want ($first, $n)")
    }
  }

  test("gate scores and keep flag follow the weighted policy") {
    val docs = Seq(
      (1L, "clean text with nothing flagged"),
      (2L, "bad bad bad"),
      (3L, "bad worse")).toDF("id", "text")
    val g = Blocklist.gate(docs, "id", "text",
      Seq(("bad", 2L), ("worse", 10L)), threshold = 7L)
      .select("id", "n_patterns_hit", "n_hits_total", "score", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(g(0) == ((1L, 0L, 0L, 0L, true)))
    assert(g(1) == ((2L, 1L, 3L, 6L, true)))
    assert(g(2) == ((3L, 2L, 2L, 12L, false)))
  }

  test("gate: NULL text counts as zero hits everywhere, keep=true") {
    val docs = Seq((1L, "bad"), (2L, null)).toDF("id", "text")
    val g = Blocklist.gate(docs, "id", "text",
      Seq(("bad", 2L)), threshold = 7L)
      .select("id", "n_patterns_hit", "n_hits_total", "score", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(g(0) == ((1L, 1L, 1L, 2L, true)))
    assert(g(1) == ((2L, 0L, 0L, 0L, true)))
  }

  test("hitsFromTable: table-sourced patterns, loud cap, dedup + sort") {
    val docs = Seq((1L, "bad worse bad")).toDF("id", "text")
    val pats = Seq("worse", "bad", "bad", "worse").toDF("p")
    val got = Blocklist.hitsFromTable(docs, "id", "text", pats, "p")
      .select("pattern", "n_hits").as[(String, Long)].collect().toSet
    assert(got == Set(("bad", 2L), ("worse", 1L)))
    val big = spark.range(0, 50).selectExpr("CAST(id AS STRING) AS p")
    val e = intercept[IllegalArgumentException] {
      Blocklist.hitsFromTable(docs, "id", "text", big, "p", maxPatterns = 10)
    }
    assert(e.getMessage.contains("maxPatterns"))
  }

  test("scrub: same-length masking, sequential nested-replace semantics") {
    val docs = Seq((1L, "abc ab c")).toDF("id", "text")
    // 'ab' masks first, destroying the 'bc ' match 'b c'? no — order:
    // pattern 1 = "ab" -> "** c ** c"? verify precisely below
    val got = Blocklist.scrub(docs, "id", "text", Seq("ab", "b c"))
      .select("scrubbed").as[String].head()
    // "abc ab c" --replace(ab,**)--> "**c ** c" --replace(b c,***)--> unchanged
    // ('b c' no longer occurs: the 'b's were masked)
    assert(got == "**c ** c")
    assert(got.length == "abc ab c".length)
    // reversed order: 'b c' first -> "abc a***", then 'ab' -> "**c a***"
    // — order-sensitive, exactly like the nested-replace oracle
    val rev = Blocklist.scrub(docs, "id", "text", Seq("b c", "ab"))
      .select("scrubbed").as[String].head()
    assert(rev == "**c a***")
  }

  test("automaton matches reference on random MULTIBYTE texts") {
    val rnd = new scala.util.Random(7)
    val alphabet = "aé日 ß" // 1-, 2-, 3-byte UTF-8 + space + ß
    val pats = Seq("aé", "é日", "日 a", "ßß", "é")
    val rows = (0 until 80).map { i =>
      val len = 1 + rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = Blocklist.hits(rows.toDF("id", "text"), "id", "text", pats)
      .select("id", "pid", "first_pos", "n_hits")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    for ((id, t) <- rows; (p, pid) <- pats.zipWithIndex) {
      val (first, n) = reference(t, p)
      val g = got.getOrElse((id, pid.toLong), (0L, 0L))
      assert(g == ((first, n)),
        s"text='$t' pattern='$p': got $g, want ($first, $n)")
    }
  }

  test("multibyte text: positions are character-based") {
    val got = Blocklist.hits(
      Seq((1L, "é日本é日本語")).toDF("id", "text"), "id", "text",
      Seq("日本", "é"))
      .select("pid", "first_pos", "n_hits")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(0L) == ((2L, 2L))) // 日本 at chars 2 and 5
    assert(got(1L) == ((1L, 2L)))
  }

  test("automaton matches a CODE-POINT reference on random ASTRAL texts") {
    // surrogate-pair-heavy alphabet: U+1F600 and U+1D11E are 2 UTF-16
    // units each, so any unit-based position or greedy cursor drifts
    val rnd = new scala.util.Random(11)
    val alphabet = Vector("a", "😀", "日", "𝄞", " ")
    val pats = Seq("😀", "a😀", "😀𝄞", "日 ", "𝄞𝄞")
    def cpReference(text: String, p: String): (Long, Long) = {
      val t = text.codePoints.toArray
      val q = p.codePoints.toArray
      var i = 0; var n = 0L; var first = 0L
      while (i <= t.length - q.length) {
        if (java.util.Arrays.equals(t.slice(i, i + q.length), q)) {
          n += 1; if (first == 0L) first = i + 1L; i += q.length
        } else i += 1
      }
      (first, n)
    }
    val rows = (0 until 80).map { i =>
      val len = 1 + rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = Blocklist.hits(rows.toDF("id", "text"), "id", "text", pats)
      .select("id", "pid", "first_pos", "n_hits")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    for ((id, t) <- rows; (p, pid) <- pats.zipWithIndex) {
      val (first, n) = cpReference(t, p)
      val g = got.getOrElse((id, pid.toLong), (0L, 0L))
      assert(g == ((first, n)),
        s"text='$t' pattern='$p': got $g, want ($first, $n)")
    }
  }

  test("supplementary-plane text: positions are code-point-based") {
    // U+1F600 is a surrogate PAIR in UTF-16 — a unit-based cursor
    // would report first_pos 4 for "a😀" and drift every later match
    val got = Blocklist.hits(
      Seq((1L, "😀a😀😀b")).toDF("id", "text"), "id", "text",
      Seq("😀", "a😀", "b"))
      .select("pid", "first_pos", "n_hits")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(0L) == ((1L, 3L))) // code points 1, 3, 4
    assert(got(1L) == ((2L, 1L)))
    assert(got(2L) == ((5L, 1L)))
  }
}
