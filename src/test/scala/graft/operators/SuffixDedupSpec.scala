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

  test("gramBucketStats: distinct-doc and distinct-gram counts per " +
      "bucket; an intentional over-cap gram reports __ng == 1") {
    val MEGA = "MEGA-GRAM!"
    val docs = ((1L to 3L).map(i => (i, s"pad${i}pad${i}q" + MEGA)))
      .toDF("doc_id", "text")
    val stats = SuffixDedup.gramBucketStats(docs, "doc_id", "text", 10)
      .as[(Long, Long, Long)].collect()
    // MEGA's bucket: 3 distinct docs, ONE distinct gram (intentional
    // class); every pad gram is doc-unique → nd=1, ng=1
    assert(stats.exists { case (_, nd, ng) => nd == 3L && ng == 1L })
    assert(stats.forall { case (_, nd, ng) => ng == 1L && nd <= 3L })
    // same doc repeating a gram dedups to one posting row
    val rep = SuffixDedup.gramBucketStats(
      Seq((9L, "XYXYXYXYXYXYXYXYXYXY")).toDF("doc_id", "text"),
      "doc_id", "text", 10).as[(Long, Long, Long)].collect()
    assert(rep.forall { case (_, nd, ng) => nd == 1L && ng == 1L })
  }

  test("capDropClasses: intentional vs collision-shrapnel drop " +
      "classification on synthetic bucket counts (a real 64-bit " +
      "collision is not constructible)") {
    val counts = Seq(
      (1L, 5L, 1L), // over cap, one gram  -> intentional
      (2L, 5L, 2L), // over cap, two grams -> collision shrapnel
      (3L, 2L, 1L), // under cap           -> neither
      (4L, 2L, 2L)  // under cap collision -> neither (kept, exact filter
                    // downstream splits per gram)
    ).toDF("h", "nd", "ng")
    val (intentional, shrapnel) =
      Dedup.capDropClasses($"nd", $"ng", maxBucketSize = 3)
    val got = counts.select($"h", intentional.as("i"), shrapnel.as("s"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(1L -> (1L, 0L), 2L -> (0L, 1L),
      3L -> (0L, 0L), 4L -> (0L, 0L)))
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

  // ==== incremental template families (r14) ============================

  /** Whole-corpus ground truth: spanPairs + CC over corpus ∪ batch,
    * restricted to batch docs, family = coalesce(label, doc_id). */
  private def wholeCorpusFamilies(corpus: Seq[(Long, String)],
      batch: Seq[(Long, String)], minLen: Int, cap: Int): Map[Long, Long] = {
    val all = (corpus ++ batch).toDF("doc_id", "text")
    val fams = Dedup.connectedComponents(
      SuffixDedup.spanPairs(all, "doc_id", "text", minLen,
          maxDocsPerGram = cap)
        .select($"id_a", $"id_b")).withColumnRenamed("id", "doc_id")
    val batchIds = batch.map(_._1).toSet
    all.select($"doc_id").join(fams, Seq("doc_id"), "left")
      .withColumn("family",
        org.apache.spark.sql.functions.coalesce($"label", $"doc_id"))
      .select($"doc_id", $"family").as[(Long, Long)].collect()
      .filter(r => batchIds(r._1)).toMap
  }

  private def incrementalFamilies(corpus: Seq[(Long, String)],
      batch: Seq[(Long, String)], minLen: Int, cap: Int): Map[Long, Long] = {
    val c = corpus.toDF("doc_id", "text")
    val idx = SuffixDedup.familyIndex(c, "doc_id", "text", minLen, cap)
    val labels = Dedup.connectedComponents(
      SuffixDedup.spanPairs(c, "doc_id", "text", minLen,
          maxDocsPerGram = cap)
        .select($"id_a", $"id_b"))
    SuffixDedup.incrementalFamilies(batch.toDF("doc_id", "text"),
        "doc_id", "text", idx, labels, minLen, cap)
      .as[(Long, Long)].collect().toMap
  }

  test("incrementalFamilies == whole-corpus rerun restricted to batch: " +
      "join-existing, bridge-two-families, batch-internal, novel, " +
      "singleton-gram promotion") {
    val P1 = "FAMILY-ONE-SHARED-PHRASE!!"
    val P2 = "FAMILY-TWO-SHARED-PHRASE!!"
    val S = "SINGLETON-CORPUS-GRAM-ABC!"
    val B = "BATCH-INTERNAL-TWIN-BLOCK!"
    val corpus = Seq(
      (1L, "aaaaaaaaaa" + P1 + "bbbbbbbbbb"),
      (2L, "cccccccccc" + P1 + "dddddddddd"),
      (5L, "eeeeeeeeee" + P2 + "ffffffffff"),
      (6L, "gggggggggg" + P2 + "hhhhhhhhhh"),
      // singleton gram: in ONE corpus doc only — a batch occurrence
      // must promote it to a real pair
      (8L, "iiiiiiiiii" + S + "jjjjjjjjjj"),
      (9L, "a corpus doc in no family at all......"))
    val batch = Seq(
      // joins family one
      (100L, "kkkkkkkkkk" + P1 + "llllllllll"),
      // bridges family one and family two through one batch doc
      (101L, "mmmmmmmmmm" + P1 + "nnnnnnnnnn" + P2 + "oooooooooo"),
      // pairs with the singleton-gram corpus doc
      (102L, "pppppppppp" + S + "qqqqqqqqqq"),
      // batch-internal twins, no corpus contact
      (103L, "rrrrrrrrrr" + B + "ssssssssss"),
      (104L, "tttttttttt" + B + "uuuuuuuuuu"),
      // entirely novel
      (105L, "wholly novel batch content, no dup"))
    val want = wholeCorpusFamilies(corpus, batch, minLen = 26, cap = 1000)
    val got = incrementalFamilies(corpus, batch, minLen = 26, cap = 1000)
    assert(got == want)
    // spot semantics: the bridge doc's family is the min across BOTH
    // standing families; novel doc is its own family
    assert(got(101L) == 1L && got(100L) == 1L)
    assert(got(102L) == 8L)
    assert(got(103L) == 103L && got(104L) == 103L)
    assert(got(105L) == 105L)
  }

  test("incrementalFamilies: corpus never contributes pairs the index " +
      "excluded — an over-cap corpus gram stays excluded for the batch") {
    val MEGA = "UNIVERSAL-BOILERPLATE-GRAM"
    // 3 corpus docs share MEGA; cap=2 → over-cap at index time, so a
    // batch doc containing MEGA must NOT join them (whole-corpus rerun
    // agrees: 4 docs > cap)
    val corpus = (1L to 3L).map(i =>
      (i, s"pad${i}pad${i}pad${i}x" + MEGA)).toSeq
    val batch = Seq((100L, "yyyyyyyyyyyyyyyyyyyy" + MEGA))
    val want = wholeCorpusFamilies(corpus, batch, minLen = 26, cap = 2)
    val got = incrementalFamilies(corpus, batch, minLen = 26, cap = 2)
    assert(got == want && got(100L) == 100L)
  }

  test("incrementalFamilies frozen-cap corner (PINNED DIVERGENCE): a " +
      "batch that pushes a standing under-cap gram over the cap keeps " +
      "the standing corpus topology — new edges on that gram are " +
      "refused, standing families are not retroactively unlinked") {
    val G = "EXACTLY-AT-CAP-SHARED-GRAM"
    val corpus = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaa" + G),
      (2L, "bbbbbbbbbbbbbbbbbbbb" + G))
    val batch = Seq((100L, "cccccccccccccccccccc" + G))
    // cap=2: corpus count 2 (kept, docs 1-2 one standing family);
    // corpus+batch count 3 > cap → the whole-corpus rerun would admit
    // NO edges at all. The incremental contract freezes the standing
    // 1-2 family and refuses the new batch edge: batch doc stays its
    // own family — which here AGREES with the rerun restricted to
    // batch docs (both give 100 -> 100)...
    val got = incrementalFamilies(corpus, batch, minLen = 26, cap = 2)
    assert(got == Map(100L -> 100L))
    assert(got == wholeCorpusFamilies(corpus, batch, minLen = 26, cap = 2))
    // ...the DIVERGENCE needs the batch doc linked INTO the standing
    // family through an under-cap gram while the batch pushes the
    // family's LINKING gram over the cap: a rerun under batch-inflated
    // counts drops G's corpus-corpus edge (1 and 2 unlink, batch pairs
    // with 2 alone → family 2); the incremental contract keeps the
    // standing 1-2 link, so the batch doc reaches the family min 1.
    val G2 = "SECOND-LINKING-GRAM-HERE!!"
    val corpus2 = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaa" + G),
      (2L, "bbbbbbbbbbbbbbbbbbbb" + G + G2))
    val batch2 = Seq((100L, "cccccccccccccccccccc" + G + G2))
    val inc = incrementalFamilies(corpus2, batch2, minLen = 26, cap = 2)
    val rerun = wholeCorpusFamilies(corpus2, batch2, minLen = 26, cap = 2)
    // rerun: G over cap (3 docs) → 1-2 unlinked; G2 pairs 2-100 → 2
    assert(rerun == Map(100L -> 2L))
    // incremental: G contributes no NEW edge but the standing {1,2}
    // family is not retroactively unlinked; G2 links 100 → 2 → label 1
    assert(inc == Map(100L -> 1L))
  }

  test("suffixFamilies == connectedComponents(spanPairs): the hash-only " +
      "one-shot resolution is exact — bridged families, over-cap " +
      "boilerplate refused, singleton grams and unpaired docs silent") {
    val P1 = "FAMILY-ONE-SHARED-PHRASE!!"
    val P2 = "FAMILY-TWO-SHARED-PHRASE!!"
    val S = "SINGLETON-CORPUS-GRAM-ABC!"
    val MEGA = "UNIVERSAL-BOILERPLATE-GRAM"
    val corpus = Seq(
      (1L, "aaaaaaaaaa" + P1 + "bbbbbbbbbb" + MEGA),
      (2L, "cccccccccc" + P1 + "dddddddddd" + MEGA),
      (3L, "qqqqqqqqqq" + P1 + "rrrrrrrrrr" + P2 + MEGA),
      (5L, "eeeeeeeeee" + P2 + "ffffffffff" + MEGA),
      (6L, "gggggggggg" + P2 + "hhhhhhhhhh"),
      (8L, "iiiiiiiiii" + S + "jjjjjjjjjj"),
      (9L, "a corpus doc in no family at all......")
    ).toDF("doc_id", "text")
    val cap = 3 // MEGA (4 docs) must be refused at this cap
    val viaPairs = Dedup.connectedComponents(
        SuffixDedup.spanPairs(corpus, "doc_id", "text", minLen = 26,
          maxDocsPerGram = cap).select($"id_a", $"id_b"))
      .as[(Long, Long)].collect().toMap
    val direct = SuffixDedup.suffixFamilies(corpus, "doc_id", "text",
        minLen = 26, maxDocsPerGram = cap)
      .as[(Long, Long)].collect().toMap
    assert(direct == viaPairs)
    assert(direct == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L,
      6L -> 1L))
  }

  test("served family index: parquet round-trip probes equal in-memory, " +
      "the batch side broadcasts, and the index is scanned, not " +
      "re-shuffled") {
    val P1 = "FAMILY-ONE-SHARED-PHRASE!!"
    val corpus = Seq(
      (1L, "aaaaaaaaaa" + P1 + "bbbbbbbbbb"),
      (2L, "cccccccccc" + P1 + "dddddddddd"),
      (9L, "a corpus doc in no family at all......")
    ).toDF("doc_id", "text")
    val batch = Seq((100L, "kkkkkkkkkk" + P1 + "llllllllll"),
      (101L, "wholly novel batch content, no dup")).toDF("doc_id", "text")
    val idx = SuffixDedup.familyIndex(corpus, "doc_id", "text", 26)
    val dir = java.nio.file.Files.createTempDirectory("famidx").toString +
      "/idx"
    SuffixDedup.writeFamilyIndex(idx, dir, nBands = 8)
    val served = SuffixDedup.readFamilyIndex(spark, dir)
    val labels = SuffixDedup.familyLabels(served)
    val want = SuffixDedup.incrementalFamilies(batch, "doc_id", "text",
      idx, SuffixDedup.familyLabels(idx), 26)
      .as[(Long, Long)].collect().toMap
    val probe = SuffixDedup.incrementalFamilies(batch, "doc_id", "text",
      served, labels, 26)
    assert(probe.as[(Long, Long)].collect().toMap == want)
    assert(want == Map(100L -> 1L, 101L -> 101L))
    // plan contract: the probe's join shape — the standing index
    // streamed against a broadcast batch-hash set — plans as a
    // BroadcastHashJoin with ZERO shuffle exchanges on the index side
    // (the end-to-end probe materializes its CC iterations, so this is
    // asserted on the join fragment itself, same keys as the operator)
    val frag = served.join(
      org.apache.spark.sql.functions.broadcast(
        Seq((123L, 1L)).toDF("h", "__nb")), Seq("h"))
      .queryExecution.executedPlan.toString
    assert(frag.contains("BroadcastHashJoin"),
      "batch hash set must broadcast against the index")
    assert(!frag.contains("Exchange hashpartitioning"),
      "the served index must be scanned, never shuffled, by a probe")
  }

  test("familyLabels(familyIndex) == connectedComponents(spanPairs): " +
      "the one-gram-pass label derivation is exact — families, " +
      "singleton grams, over-cap boilerplate, unpaired docs") {
    val P1 = "FAMILY-ONE-SHARED-PHRASE!!"
    val P2 = "FAMILY-TWO-SHARED-PHRASE!!"
    val S = "SINGLETON-CORPUS-GRAM-ABC!"
    val MEGA = "UNIVERSAL-BOILERPLATE-GRAM"
    val corpus = Seq(
      (1L, "aaaaaaaaaa" + P1 + "bbbbbbbbbb" + MEGA),
      (2L, "cccccccccc" + P1 + "dddddddddd" + MEGA),
      // bridge doc: P1 and P2 in one doc → one merged component
      (3L, "qqqqqqqqqq" + P1 + "rrrrrrrrrr" + P2 + MEGA),
      (5L, "eeeeeeeeee" + P2 + "ffffffffff" + MEGA),
      (6L, "gggggggggg" + P2 + "hhhhhhhhhh"),
      (8L, "iiiiiiiiii" + S + "jjjjjjjjjj"),
      (9L, "a corpus doc in no family at all......")
    ).toDF("doc_id", "text")
    // cap=3 puts MEGA (4 docs) over the cap: it must not link 1/2/3/5
    val cap = 3
    val viaPairs = Dedup.connectedComponents(
        SuffixDedup.spanPairs(corpus, "doc_id", "text", minLen = 26,
          maxDocsPerGram = cap).select($"id_a", $"id_b"))
      .as[(Long, Long)].collect().toMap
    val viaIndex = SuffixDedup.familyLabels(
        SuffixDedup.familyIndex(corpus, "doc_id", "text", minLen = 26,
          maxDocsPerGram = cap), maxDocsPerGram = cap)
      .as[(Long, Long)].collect().toMap
    assert(viaIndex == viaPairs)
    // spot semantics: P1+P2 merged through the bridge; MEGA refused;
    // singleton-gram doc 8 and the unpaired doc 9 label nothing
    assert(viaPairs == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L,
      6L -> 1L))
  }
}
