package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SuffixDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], minLen: Int,
      minOcc: Long = 2L) =
    SuffixDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen, minOcc)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("a planted cross-doc duplicate is returned as one maximal span") {
    // "shared phrase here" (18 chars) sits inside distinct padding; with
    // L=10 every covering 10-gram is duplicated, and the merge must
    // return exactly the 18-char maximal interval in both docs.
    val docs = Seq(
      (1L, "aaaabbbbcc" + "shared phrase here" + "ddddeeeefff"),
      (2L, "qqqqwwwwrr" + "shared phrase here" + "ttttyyyyuuu"))
    val got = spans(docs, minLen = 10)
    // span starts at 11 (1-based), 9 duplicated 10-gram positions merge
    assert(got == Set((1L, 11L, 18L, 9L), (2L, 11L, 18L, 9L)))
  }

  test("within-doc repeats are duplicates; disjoint islands stay split") {
    // the same 12-char block appears twice in ONE doc with a >L gap
    // (the filler's 31 chars are pairwise distinct, so it contributes
    // no duplicated grams itself), so both occurrences are spans (two
    // islands, not one).
    val block = "zxcvbnmasdfg"
    val docs = Seq((7L, block + "0123456789ABCDEFGHIJKLMNOPQRSTU" + block))
    val got = spans(docs, minLen = 12)
    assert(got == Set((7L, 1L, 12L, 1L), (7L, 44L, 12L, 1L)))
  }

  test("adjacent and overlapping hits merge; sub-threshold text is silent") {
    // no duplicated substring of length >= L anywhere → empty output,
    // even though shorter repeats exist.
    val docs = Seq((1L, "abcabcabcX"), (2L, "defdefdefY"))
    assert(spans(docs, minLen = 10).isEmpty)
  }

  test("minOcc > 2 requires the higher multiplicity") {
    val docs = Seq(
      (1L, "PAD1PAD1PAD1" + "needle-exactly-here!" + "XXRANDOMTAIL"),
      (2L, "PAD2PAD2PAD2" + "needle-exactly-here!" + "YYRANDOMTAIL"),
      (3L, "PAD3PAD3PAD3" + "other-content-header" + "ZZRANDOMTAIL"))
    val atLeast2 = spans(docs, minLen = 20, minOcc = 2L)
    val atLeast3 = spans(docs, minLen = 20, minOcc = 3L)
    assert(atLeast2 == Set((1L, 13L, 20L, 1L), (2L, 13L, 20L, 1L)))
    assert(atLeast3.isEmpty)
  }

  test("stripStats ledger: disjoint spans, zeros for clean docs") {
    val docs = Seq(
      (1L, "aaaabbbbcc" + "shared phrase here" + "ddddeeeefff"),
      (2L, "qqqqwwwwrr" + "shared phrase here" + "ttttyyyyuuu"),
      (3L, "totally unique text with no repeats at all"))
    val got = SuffixDedup.stripStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 39L, 1L, 18L, 21L),
      (2L, 39L, 1L, 18L, 21L),
      (3L, 42L, 0L, 0L, 42L)))
  }

  test("periodic self-overlap stays one island covering the whole run") {
    // "ababab...": every L-gram equals every other aligned gram; the
    // merged span must be the full periodic run, counted once.
    val run = "ab" * 20 // 40 chars
    val got = spans(Seq((5L, run + "QRSTUVWXYZ0123")), minLen = 10)
    assert(got == Set((5L, 1L, 40L, 31L)))
  }

  test("keep-first: only redundant copies are spans") {
    val docs = Seq(
      (1L, "aaaabbbbcc" + "shared phrase here" + "ddddeeeefff"),
      (2L, "qqqqwwwwrr" + "shared phrase here" + "ttttyyyyuuu"))
    // every shared gram's first occurrence is in doc 1 (smaller id), so
    // doc 1 keeps its copy and only doc 2's is redundant
    val got = SuffixDedup.redundantSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 11L, 18L, 9L)))
  }

  test("keep-first stripStats keeps one copy corpus-wide") {
    val docs = Seq(
      (1L, "aaaabbbbcc" + "shared phrase here" + "ddddeeeefff"),
      (2L, "qqqqwwwwrr" + "shared phrase here" + "ttttyyyyuuu"),
      (3L, "totally unique text with no repeats at all"))
    val got = SuffixDedup.stripStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 10, keepFirst = true)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 39L, 0L, 0L, 39L), // the retained first copy
      (2L, 39L, 1L, 18L, 21L),
      (3L, 42L, 0L, 0L, 42L)))
  }

  test("keep-first within one doc: the later occurrence is redundant") {
    val block = "zxcvbnmasdfg"
    val docs = Seq((7L, block + "0123456789ABCDEFGHIJKLMNOPQRSTU" + block))
    val got = SuffixDedup.redundantSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 12)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((7L, 44L, 12L, 1L)))
  }

  private def stripText(docs: Seq[(Long, String)], minLen: Int,
      keepFirst: Boolean) =
    SuffixDedup.stripText(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen, keepFirst = keepFirst)
      .as[(Long, String, Long)].collect().toSet

  test("stripText removes every copy; clean docs pass verbatim") {
    val docs = Seq(
      (1L, "aaaabbbbcc" + "shared phrase here" + "ddddeeeefff"),
      (2L, "qqqqwwwwrr" + "shared phrase here" + "ttttyyyyuuu"),
      (3L, "totally unique text with no repeats at all"))
    assert(stripText(docs, minLen = 10, keepFirst = false) == Set(
      (1L, "aaaabbbbcc" + "ddddeeeefff", 21L),
      (2L, "qqqqwwwwrr" + "ttttyyyyuuu", 21L),
      (3L, "totally unique text with no repeats at all", 42L)))
  }

  test("stripText keep-first retains the first copy, empties a clone") {
    val docs = Seq(
      (1L, "the very same document body"),
      (2L, "the very same document body"))
    assert(stripText(docs, minLen = 10, keepFirst = true) == Set(
      (1L, "the very same document body", 27L),
      (2L, "", 0L)))
    // remove-all empties both clones
    assert(stripText(docs, minLen = 10, keepFirst = false) == Set(
      (1L, "", 0L), (2L, "", 0L)))
  }

  test("stripText interior spans splice the flanks together") {
    val block = "zxcvbnmasdfg"
    val filler = "0123456789ABCDEFGHIJKLMNOPQRSTU"
    val docs = Seq((7L, block + filler + block))
    // keep-first: first block survives, second is cut
    assert(stripText(docs, minLen = 12, keepFirst = true) == Set(
      (7L, block + filler, 43L)))
    // remove-all: both copies cut, the filler remains
    assert(stripText(docs, minLen = 12, keepFirst = false) == Set(
      (7L, filler, 31L)))
  }

  test("stripText agrees with the stripStats ledger") {
    val docs = Seq(
      (1L, "aaaabbbbcc" + "shared phrase here" + "ddddeeeefff"),
      (2L, "qqqqwwwwrr" + "shared phrase here" + "ttttyyyyuuu"),
      (3L, "totally unique text with no repeats at all"),
      (4L, "aaaabbbbcc" + "shared phrase here" + "ddddeeeefff"))
    for (kf <- Seq(true, false)) {
      val text = SuffixDedup.stripText(docs.toDF("doc_id", "text"),
          "doc_id", "text", minLen = 10, keepFirst = kf)
        .select("doc_id", "kept_chars")
        .as[(Long, Long)].collect().toMap
      val ledger = SuffixDedup.stripStats(docs.toDF("doc_id", "text"),
          "doc_id", "text", minLen = 10, keepFirst = kf)
        .select("doc_id", "kept_chars")
        .as[(Long, Long)].collect().toMap
      assert(text == ledger, s"keepFirst=$kf")
    }
  }

  test("spanPairs: shared phrases connect docs, transitively distinct") {
    val X = "SHARED-PHRASE-X!"
    val Y = "COMMON-SEGMENT-Y"
    val docs = Seq(
      (1L, "abcdefghij" + X + "klmnopqrst"),
      (2L, "uvwxyz0123" + X + Y + "4567"),
      (3L, "ABCDEFGHIJ" + Y + "KLMNOPQRST"))
    val got = SuffixDedup.spanPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 10)
      .as[(Long, Long, Long)].collect().toSet
    // 7 interior 10-grams of each 16-char phrase; no (1,3) edge
    assert(got == Set((1L, 2L, 7L), (2L, 3L, 7L)))
  }

  test("spanPairs: the docs-per-gram cap excludes universal boilerplate") {
    val Z = "BOILERPLATE-RUN!"
    val docs = Seq(
      (5L, "aaaaabbbbb" + Z + "cccccddddd"),
      (6L, "eeeeefffff" + Z + "ggggghhhhh"),
      (7L, "iiiiijjjjj" + Z + "kkkkklllll"))
    val capped = SuffixDedup.spanPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 10, maxDocsPerGram = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped.isEmpty)
    // star mode (default): every member pairs with the gram-min only
    val star = SuffixDedup.spanPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(star == Set((5L, 6L, 7L), (5L, 7L, 7L)))
    // exhaustive mode: all pairs within the cap
    val full = SuffixDedup.spanPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 10, starEdges = false)
      .as[(Long, Long, Long)].collect().toSet
    assert(full == Set((5L, 6L, 7L), (5L, 7L, 7L), (6L, 7L, 7L)))
  }

  test("spanPairs: an over-cap mega-gram never REACHES the collect " +
      "buffer (pre-cap drops its hash bucket upstream)") {
    // one boilerplate 10-gram in 5 docs, one legit phrase in 2; with
    // cap=2 the mega bucket must be gone from the postings feeding the
    // collect_set — the r11 shape only filtered AFTER the buffer built
    val MEGA = "MEGA-GRAM!"
    val X = "SHARED-PHRASE-X!"
    val docs = ((1L to 5L).map(i => (i, s"pad${i}pad${i}q" + MEGA)) ++ Seq(
      (11L, "abcdefghij" + X + "klmnopqrst"),
      (12L, "uvwxyz0123" + X + "4567abcdef")))
      .toDF("doc_id", "text")
    val postings = SuffixDedup.cappedPostings(
      docs, "doc_id", "text", minLen = 10, maxDocsPerGram = 2)
    assert(postings.filter($"gram" === MEGA).count() == 0,
      "mega-gram postings must be dropped BEFORE aggregation")
    // the under-cap phrase still pairs normally through the same path
    val pairs = SuffixDedup.spanPairs(docs, "doc_id", "text",
        minLen = 10, maxDocsPerGram = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((11L, 12L, 7L)))
  }

  test("spanPairs pre-cap is EXACT at the cap: a (cap, 2*cap] gram's " +
      "bucket is dropped before the collect buffer too (r13: the r12 " +
      "collision headroom shuffled 10x doomed postings at sf1)") {
    // one gram in 3 docs with cap=2: inside the old (cap, 2*cap]
    // retention band, outside the new exact bound — must vanish from
    // the postings, not merely from the per-gram-filtered output
    val TRIPLE = "TRIPLE-GRAM"
    val X = "SHARED-PHRASE-X!"
    val docs = ((1L to 3L).map(i => (i, s"pad${i}pad${i}q" + TRIPLE)) ++ Seq(
      (11L, "abcdefghij" + X + "klmnopqrst"),
      (12L, "uvwxyz0123" + X + "4567abcdef")))
      .toDF("doc_id", "text")
    val postings = SuffixDedup.cappedPostings(
      docs, "doc_id", "text", minLen = 11, maxDocsPerGram = 2)
    assert(postings.filter($"gram" === TRIPLE).count() == 0,
      "a bucket past the exact cap must not reach the aggregation")
    // output unchanged vs the headroom era: the triple gram was always
    // excluded by the per-gram filter; the under-cap pair still emits
    val pairs = SuffixDedup.spanPairs(docs, "doc_id", "text",
        minLen = 11, maxDocsPerGram = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((11L, 12L, 6L)))
  }

  test("spanPairs: star edges resolve IDENTICAL components to all-pairs " +
      "on the gate fixture") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def comps(starEdges: Boolean) = Dedup.connectedComponents(
        SuffixDedup.spanPairs(docs, "doc_id", "text", minLen = 25,
            starEdges = starEdges)
          .select($"id_a", $"id_b"))
      .as[(Long, Long)].collect().toSet
    val star = comps(starEdges = true)
    assert(star.nonEmpty, "fixture must actually contain families")
    assert(star == comps(starEdges = false))
  }

  test("family split: all members of a family share one split") {
    val X = "SHARED-PHRASE-X!"
    val docs = Seq(
      (1L, "abcdefghij" + X + "klmnopqrst"),
      (2L, "uvwxyz0123" + X + "45670123ab"),
      (3L, "a doc with no duplicate at all"))
    val pairs = SuffixDedup.spanPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", minLen = 10)
    val fams = Dedup.connectedComponents(
      pairs.select($"id_a", $"id_b")).withColumnRenamed("id", "doc_id")
    val withFam = docs.toDF("doc_id", "text").select($"doc_id")
      .join(fams, Seq("doc_id"), "left")
      .withColumn("family",
        org.apache.spark.sql.functions.coalesce($"label", $"doc_id"))
    val split = CorpusOps.splitAssign(
        withFam.select($"doc_id", $"family"), "family",
        Seq(("train", 90), ("val", 5), ("test", 5)))
      .select($"doc_id", $"family", $"split")
      .as[(Long, Long, String)].collect()
      .map { case (d, f, s) => d -> ((f, s)) }.toMap
    assert(split(1L)._1 == 1L && split(2L)._1 == 1L)
    assert(split(1L)._2 == split(2L)._2, "family must share a split")
    assert(split(3L)._1 == 3L)
  }

  test("incremental: batch spans against an indexed corpus") {
    val phrase = "shared phrase here"
    val corpus = Seq(
      (1L, "aaaabbbbcc" + phrase + "ddddeeeefff"),
      // a corpus-internal duplicate the batch does NOT contain — must
      // never surface in the incremental result
      (2L, "corpus-only duplicate run XYZ1"),
      (3L, "corpus-only duplicate run XYZ2"))
    val batch = Seq(
      (100L, "qqqqwwwwrr" + phrase + "ttttyyyyuuu"),
      (101L, "completely novel batch text!!"))
    val idx = SuffixDedup.suffixIndex(corpus.toDF("doc_id", "text"),
      "doc_id", "text", minLen = 10)
    val got = SuffixDedup.incrementalSpans(batch.toDF("doc_id", "text"),
        "doc_id", "text", idx, minLen = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((100L, 11L, 18L, 9L)))
  }

  test("incremental: batch-internal duplicates count without the corpus") {
    val corpus = Seq((1L, "nothing in common with batch"))
    val batch = Seq(
      (100L, "AAAA" + "twin paragraph body" + "BBBB"),
      (101L, "CCCC" + "twin paragraph body" + "DDDD"))
    val idx = SuffixDedup.suffixIndex(corpus.toDF("doc_id", "text"),
      "doc_id", "text", minLen = 10)
    val got = SuffixDedup.incrementalSpans(batch.toDF("doc_id", "text"),
        "doc_id", "text", idx, minLen = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((100L, 5L, 19L, 10L), (101L, 5L, 19L, 10L)))
  }

  test("docs shorter than minLen are skipped, not errored") {
    val docs = Seq((1L, "tiny"), (2L, "alsotiny"))
    assert(spans(docs, minLen = 10).isEmpty)
    val stats = SuffixDedup.stripStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(stats == Set((1L, 4L, 0L, 0L, 4L), (2L, 8L, 0L, 0L, 8L)))
  }
}
