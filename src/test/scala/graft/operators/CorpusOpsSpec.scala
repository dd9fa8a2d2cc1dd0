package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splitAssign: labels are stable under row order and partitioning, " +
    "and proportions track the weights") {
    val docs = (0L until 2000L).toDF("doc_id")
    val a = CorpusOps.splitAssign(docs, "doc_id",
      Seq(("train", 90), ("val", 5), ("test", 5)))
      .as[(Long, String)].collect().toMap
    val b = CorpusOps.splitAssign(docs.orderBy(rand(1)).repartition(7),
      "doc_id", Seq(("train", 90), ("val", 5), ("test", 5)))
      .as[(Long, String)].collect().toMap
    assert(a == b) // content-hash split: order/partitioning irrelevant
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0)
    assert(math.abs(frac("train") - 0.90) < 0.03)
    assert(math.abs(frac("val") - 0.05) < 0.02)
    assert(math.abs(frac("test") - 0.05) < 0.02)
  }

  test("packSequences: next-fit packing against a hand-run reference") {
    // bucketDocs=100 → one bucket for ids 0..5; seqLen=10:
    //  id0 t4 → seq0 off0 (fill 4)
    //  id1 t5 → seq0 off4 (fill 9)
    //  id2 t2 → overflow → seq1 off0 (fill 2)
    //  id3 t12 → overflow → seq2 off0 (oversize sits alone, fill 12)
    //  id4 t1 → overflow → seq3 off0 (fill 1)
    //  id5 t9 → fits → seq3 off1 (fill 10, exactly at capacity)
    val docs = Seq((0L, 4L), (1L, 5L), (2L, 2L), (3L, 12L), (4L, 1L),
      (5L, 9L)).toDF("doc_id", "toks")
    val got = CorpusOps.packSequences(docs, "doc_id", "toks",
      seqLen = 10L, bucketDocs = 100L)
      .select("doc_id", "bucket", "seq", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 0L, 0L, 0L), (1L, 0L, 0L, 4L), (2L, 0L, 1L, 0L),
      (3L, 0L, 2L, 0L), (4L, 0L, 3L, 0L), (5L, 0L, 3L, 1L)))
  }

  test("packSequences: sequences never span buckets; row order and " +
    "partitioning are irrelevant") {
    val docs = (0L until 50L).map(i => (i, 7L)).toDF("doc_id", "toks")
    val a = CorpusOps.packSequences(docs, "doc_id", "toks", 20L, 10L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = CorpusOps.packSequences(docs.orderBy(rand(7)).repartition(5),
      "doc_id", "toks", 20L, 10L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    // 7-token docs, capacity 20 → 2 per sequence; each 10-doc bucket
    // restarts at seq 0 with its first doc at offset 0
    assert(a.filter(_._1 % 10 == 0)
      .forall { case (_, _, b_, s, off) => s == 0 && off == 0 })
    val perBucketSeqs = a.groupBy(_._3).view.mapValues(_.map(_._4).max).toMap
    assert(perBucketSeqs.values.forall(_ == 4)) // ceil(10/2)-1
  }

  test("kAnonymity: groups below k flag suppressed, others pass") {
    val rows = Seq(
      (1L, "us", "en"), (2L, "us", "en"), (3L, "us", "en"),
      (4L, "fr", "fr"), (5L, "fr", "fr"),
      (6L, "de", "de")).toDF("id", "region", "lang")
    val got = CorpusOps.kAnonymity(rows, "id", Seq("region", "lang"), 3L)
      .select("id", "group_size", "suppressed")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, false), (2L, 3L, false), (3L, 3L, false),
      (4L, 2L, true), (5L, 2L, true), (6L, 1L, true)))
  }

  test("noveltyScore: exact known/novel split against the reference") {
    val ref = Seq((100L, "a b c d")).toDF("doc_id", "text")
    // doc 1: grams {a b c, b c d} both known → 0 novel
    // doc 2: grams {b c d, c d X, d X e} → 1 known, 2 novel
    // doc 3: too short → absent
    val corpus = Seq((1L, "a b c d"), (2L, "b c d X e"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = CorpusOps.noveltyScore(corpus, ref, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 2L, 0L, 0L),
      (2L, 3L, 1L, 2L, 666666L)))
  }

  test("noveltyAgainstIndex == noveltyScore, reference never re-read") {
    val ref = Seq((100L, "a b c d e"), (101L, "b c d f")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c d X"), (2L, "p q r s"), (3L, "b c d f g"))
      .toDF("doc_id", "text")
    val direct = CorpusOps.noveltyScore(corpus, ref, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val viaIndex = CorpusOps.noveltyAgainstIndex(corpus,
      CorpusOps.noveltyIndex(ref, "doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(direct == viaIndex)
    assert(direct.nonEmpty)
    // index counts distinct docs per gram: "b c d" appears in both refs
    val n = CorpusOps.noveltyIndex(ref, "doc_id", "text")
      .filter(col("n_docs") === 2L).count()
    assert(n == 1L)
  }

  test("keySkewReport: magnitude buckets, totals, and shares on a " +
    "hand-built skewed key set") {
    // keys: 5 keys x 1 row, 2 keys x 10 rows, 1 key x 100 rows
    val rows = (Seq.tabulate(5)(i => Seq.fill(1)(s"k$i")) ++
      Seq.tabulate(2)(i => Seq.fill(10)(s"m$i")) :+
      Seq.fill(100)("big")).flatten.toDF("k")
    val out = CorpusOps.keySkewReport(rows, "k")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1, 5L, 5L, 1L, 5L * 1000000L / 125L),
      (2, 2L, 20L, 10L, 20L * 1000000L / 125L),
      (3, 1L, 100L, 100L, 100L * 1000000L / 125L)))
  }

  test("curriculumOrder: 0..n-1 permutation, bucket-monotone, equal to " +
    "the naive global window, stable under repartitioning") {
    val docs = (0L until 300L).map(i => (i, 10L + (i * 13) % 170))
      .toDF("doc_id", "n_chars")
    val out = CorpusOps.curriculumOrder(docs, "doc_id",
      expr("n_chars div 50"), seed = "e1")
      .select(col("doc_id"), expr("n_chars div 50").as("b"),
        col("curriculum_rank"))
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._3).sorted.toSeq == (0L until 300L))
    // all of bucket b precedes all of bucket b+1
    val byRank = out.sortBy(_._3).map(_._2).toSeq
    assert(byRank == byRank.sorted)
    val naive = docs.withColumn("__h", conv(substring(md5(to_binary(
        concat(col("doc_id").cast("string"), lit(":e1")), lit("utf-8"))),
        18, 15), 16, 10).cast("long"))
      .withColumn("r", row_number().over(Window.orderBy(
        expr("n_chars div 50"), col("__h"), col("doc_id"))) - 1)
      .select(col("doc_id"), col("r").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(out.map(r => r._1 -> r._3).toMap == naive)
    val reparted = CorpusOps.curriculumOrder(docs.repartition(7), "doc_id",
      expr("n_chars div 50"), seed = "e1")
      .select(col("doc_id"), col("curriculum_rank"))
      .as[(Long, Long)].collect().toMap
    assert(reparted == naive)
  }

  test("packShards: two-phase range-partitioned form equals the naive " +
    "global-window cumsum, and shard token totals respect the budget") {
    val docs = (0L until 500L).map(i => (i, 1L + (i * 37) % 400))
      .toDF("doc_id", "n_tokens")
    val budget = 3000L
    val fast = CorpusOps.packShards(docs.repartition(9), "doc_id",
      "n_tokens", budget)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    val naive = docs.withColumn("before", coalesce(sum("n_tokens").over(
        Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard_id", expr(s"before DIV ${budget}L"))
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(fast == naive)
    // every shard's token total stays within budget + one max-doc slack
    // (greedy packing can overshoot by at most the doc that crosses the
    // boundary)
    val totals = docs.as[(Long, Long)].collect().toMap
    val byShard = fast.groupBy(_._2).view
      .mapValues(_.keys.map(totals).sum).toMap
    byShard.foreach { case (shard, tot) =>
      assert(tot <= budget + 400, s"shard $shard holds $tot tokens")
    }
    assert(byShard.size > 1)
  }

  test("packShards: shard assignment is a pure function of the data — " +
    "identical across invocations, input partitionings, and shuffle " +
    "partition counts (regression: physical partition ids must never " +
    "leak into the offsets)") {
    // skewed ids: quantile boundaries land unevenly, exercising the
    // bucket edges where the old spark_partition_id() form could let the
    // totals job and the window job disagree
    val docs = ((0L until 300L) ++ (100000L until 100200L))
      .map(i => (i, 1L + (i * 131) % 700)).toDF("doc_id", "n_tokens")
    val naive = docs.withColumn("before", coalesce(sum("n_tokens").over(
        Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard_id", expr("before DIV 2500L"))
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (shuffleParts <- Seq("3", "17", "32"); inputParts <- Seq(1, 13)) {
        spark.conf.set("spark.sql.shuffle.partitions", shuffleParts)
        val fast = CorpusOps.packShards(docs.repartition(inputParts),
          "doc_id", "n_tokens", budget = 2500L)
          .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
        assert(fast == naive,
          s"diverged at shuffleParts=$shuffleParts inputParts=$inputParts")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("profile: exact per-column stats including nulls and lexical " +
    "min/max; approx variant honors the HLL rsd contract with no Expand") {
    val docs = Seq(
      (1L, "alpha", null: String), (2L, "beta", "en"),
      (3L, null: String, "de"), (4L, "alpha", "en"))
      .toDF("id", "word", "lang")
    val got = CorpusOps.profile(docs)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 4L, 0L, 4L, "1", "4")))
    assert(got("word") == (("word", 4L, 1L, 2L, "alpha", "beta")))
    assert(got("lang") == (("lang", 4L, 1L, 2L, "de", "en")))
    // approx: same row/null/min/max, distinct within rsd on a wide column
    val wide = (0L until 5000L).map(i => (i, s"v${i % 1234}"))
      .toDF("id", "v")
    val exact = CorpusOps.profile(wide)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val approx = CorpusOps.profileApprox(wide, rsd = 0.02)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    for (c <- Seq("id", "v")) {
      assert(approx(c)._2 == exact(c)._2 && approx(c)._3 == exact(c)._3)
      assert(approx(c)._5 == exact(c)._5 && approx(c)._6 == exact(c)._6)
      val (e, a) = (exact(c)._4.toDouble, approx(c)._4.toDouble)
      assert(math.abs(a - e) / e < 0.08, s"$c: approx $a vs exact $e")
    }
    // the approx plan must not contain the multi-distinct Expand
    val plan = CorpusOps.profileApprox(wide).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Expand"), "HLL profile should be Expand-free")
  }

  test("decontaminate: an embedded benchmark item flags with containment " +
    "1.0; unrelated docs stay clean; eval side is broadcast") {
    val evalSet = Seq((100L, "the quick brown fox jumps over the dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro text then the quick brown fox jumps over the dog and more"),
      (2L, "completely different content about spark plans and shuffles"))
      .toDF("doc_id", "text")
    val got = CorpusOps.decontaminate(corpus, evalSet, "doc_id", "text",
      shingleN = 3, minContainment = 0.5)
    val rows = got.select("corpus_id", "eval_id", "containment")
      .as[(Long, Long, Double)].collect()
    assert(rows.toSeq == Seq((1L, 100L, 1.0))) // fully contained, doc 2 clean
    assert(got.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "eval shingle index must broadcast")
  }

  test("qualityGates: each rule flags independently and keep is the " +
    "conjunction") {
    val docs = Seq(
      (1L, Seq.fill(60)("hello").mkString(" ")), // passes all
      (2L, "too short"), // fails n_words
      (3L, Seq.fill(60)("a").mkString(" ")), // fails mean word length
      (4L, Seq.fill(60)("1234").mkString(" "))) // fails alpha fraction
      .toDF("doc_id", "text")
    val got = CorpusOps.qualityGates(docs, "text")
      .select("doc_id", "gate_n_words", "gate_mean_word_len",
        "gate_alpha_frac", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(got.sortBy(_._1) == Seq(
      (1L, true, true, true, true),
      (2L, false, true, true, false),
      (3L, true, false, true, false),
      (4L, true, true, false, false)))
  }

  test("scrubPii replaces emails, phones, and IPv4s but leaves " +
    "look-alikes alone") {
    val got = Seq(
      "mail a.b+c@x-y.org now",
      "phone 555-123-4567 and 555.987.6543",
      "ip 10.0.0.1 but version 1.2.3 stays",
      "not an email: a@b, not a phone: 12-34-56")
      .toDF("text")
      .select(graft.functions.TextFunctions.scrubPii($"text"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "mail <EMAIL> now",
      "phone <PHONE> and <PHONE>",
      "ip <IP> but version 1.2.3 stays",
      "not an email: a@b, not a phone: 12-34-56"))
  }

  test("repetitionStats: degenerate repetition maxes the fractions, " +
    "varied text passes the gate, single-word docs don't blow up") {
    val docs = Seq(
      (1L, "a a a a"), // one bigram repeated: top_bigram_frac 1.0
      (2L, Seq.tabulate(100)(i => s"w$i").mkString(" ")), // all distinct
      (3L, "solo")) // no bigrams at all
      .toDF("doc_id", "text")
    val got = CorpusOps.repetitionStats(docs, "doc_id", "text")
      .select("doc_id", "n_words", "dup_word_frac", "top_bigram_frac",
        "gate_repetition")
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 4 && got(1L)._3 == 0.75 && got(1L)._4 == 1.0)
    assert(!got(1L)._5) // boilerplate fails the gate
    assert(got(2L)._3 == 0.0 && got(2L)._4 < 0.02 && got(2L)._5)
    assert(got(3L)._4 == 0.0 && got(3L)._5) // no bigrams → frac 0
  }

  test("ngramRepetition: hand-computed coverage ppm, tie→hash-asc argmax, " +
    "dup grams counted, diverse text passes the gate") {
    val docs = Seq(
      // w=[a,b,a,b,a,b] len(text)=11: top2 "a b"×3·3ch=9; top3 tie 2/2
      // broken by md5-52 hash asc — both candidates ("a b a"/"b a b")
      // are 5ch, so topchars=10 whichever wins; top4 "a b a b"(7ch)×2=14
      // (overlap overcount >1e6 is by convention); no dup 5/10-grams
      (1L, "a b a b a b"),
      // "p q r s t" repeats at w-positions 1 and 6 → dup5 = 2·9 = 18
      (2L, "p q r s t p q r s t u v w x y z aa bb cc dd ee ff"),
      // 60 distinct 3-char words: every stat tiny → gate true
      (3L, Seq.tabulate(60)(i => f"w$i%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val got = CorpusOps.ngramRepetition(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    val len2 = "p q r s t p q r s t u v w x y z aa bb cc dd ee ff".length
    assert(got(1L) == ((1L, 11L, 9L * 1000000 / 11, 10L * 1000000 / 11,
      14L * 1000000 / 11, 0L, 0L, false)))
    assert(got(2L)._6 == 18L * 1000000 / len2) // dup5_ppm
    assert(got(2L)._7 == 0L) // no duplicated 10-gram
    assert(got(3L)._8, "diverse doc must pass the gate")
    // every bigram count 1 and every bigram is 7 chars ("wNN wMM"), so
    // the hash-asc argmax yields 7 chars whichever gram wins
    assert(got(3L)._3 == 7L * 1000000 / 239)
  }

  test("lineRepetition: hand-computed dup-unit and dup-char ppm, " +
    "empty lines count as units, break-free docs are one unit") {
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma"),
      (2L, "para one\n\npara two\n\npara one"),
      (4L, "x\nx\nx\nx"),
      (5L, "single")).toDF("doc_id", "text")
    val got = CorpusOps.lineRepetition(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: lines {alpha×2, beta, gamma}: 1/4 dup, 5/19 dup chars
    assert(got(1L) == ((1L, 4L, 250000L, 5L * 1000000 / 19, 1L, 0L, 0L,
      false))) // 263157 > 200000 → gate fails on line chars
    // doc 2: lines [para one, "", para two, "", para one] → 2/5 dup,
    // 8/24 chars; paras {para one×2, para two} → 1/3 dup, 8/24 chars
    assert(got(2L) == ((2L, 5L, 400000L, 333333L, 3L, 333333L, 333333L,
      false)))
    // doc 4: x×4 → 3/4 dup both measures; single para
    assert(got(4L) == ((4L, 4L, 750000L, 750000L, 1L, 0L, 0L, false)))
    assert(got(5L) == ((5L, 1L, 0L, 0L, 1L, 0L, 0L, true)))
  }

  test("vocabulary: tf counts every occurrence, df counts documents, " +
    "top-n is a total order") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "banana! banana? cherry.")).toDF("doc_id", "text")
    val got = CorpusOps.vocabulary(docs, "doc_id", "text", 2)
      .as[(String, Long, Long)].collect().toSeq
    // banana tf=3 df=2; apple tf=3 df=2 — tie broken by token asc
    assert(got == Seq(("apple", 3L, 2L), ("banana", 3L, 2L)))
  }

  test("stratifiedSample: deterministic under row order/partitioning, " +
    "rates tracked per stratum, unmapped strata dropped") {
    val docs = (0L until 3000L).map(i => (i, if (i % 3 == 0) "a"
      else if (i % 3 == 1) "b" else "c")).toDF("doc_id", "dom")
    val rates = Map("a" -> 1000000L, "b" -> 300000L) // c absent → dropped
    val x = CorpusOps.stratifiedSample(docs, "doc_id", "dom", rates)
      .as[(Long, String)].collect().toSet
    val y = CorpusOps.stratifiedSample(docs.orderBy(rand(7)).repartition(5),
      "doc_id", "dom", rates).as[(Long, String)].collect().toSet
    assert(x == y)
    val byDom = x.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byDom("a") == 1000) // rate 1.0 keeps the whole stratum
    assert(math.abs(byDom("b") / 1000.0 - 0.3) < 0.05)
    assert(!byDom.contains("c"))
  }

  test("solveMixtureRates: binding stratum kept whole, achieved mixture " +
    "matches the target") {
    val counts = Map("web" -> 8000L, "books" -> 1000L, "code" -> 3000L)
    val targets = Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25)
    val rates = CorpusOps.solveMixtureRates(counts, targets)
    // books is binding: 1000/0.25 = 4000 total → books kept 100%
    assert(rates("books") == 1000000L)
    val kept = rates.map { case (k, r) => k -> counts(k) * r / 1000000.0 }
    val tot = kept.values.sum
    targets.foreach { case (k, w) =>
      assert(math.abs(kept(k) / tot - w) < 0.01, s"$k mixture off")
    }
  }

  test("dupSpans: shared trigrams count once per OCCURRENCE, " +
    "unique docs score zero, short docs emit no row") {
    val boiler = "all rights reserved"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler"),       // 4 grams, 1 dup
      (2L, s"$boiler $boiler delta"),           // repeated span in one doc
      (3L, "totally unique text with no overlap at all"),
      (4L, "hi there")                          // < 3 tokens → absent
    ).toDF("doc_id", "text")
    val got = CorpusOps.dupSpans(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(4L))
    assert(got(3L)._3 == 0L && got(3L)._4 == 0.0)
    // doc1: tokens=6 → 4 grams; "all rights reserved" shared with doc2
    assert(got(1L)._2 == 4L && got(1L)._3 == 1L && got(1L)._4 == 0.25)
    // doc2: 7 tokens → 5 grams; BOTH occurrences of the shared gram count
    // ("all rights reserved" at positions 1 and 4)
    assert(got(2L)._2 == 5L && got(2L)._3 == 2L)
  }

  test("chunkDocuments property: over seeded random (doc, chunk, overlap) " +
    "configs, dropping each chunk's overlap prefix reconstructs the doc " +
    "exactly and no chunk is contained in its predecessor") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 8) {
      val chunk = 2 + rnd.nextInt(40)
      val overlap = rnd.nextInt(chunk)
      val docs = (1L to 40L).map { i =>
        val n = 1 + rnd.nextInt(120)
        (i, (1 to n).map(j => s"t${i}_$j").mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val got = CorpusOps.chunkDocuments(df, "doc_id", "text", chunk, overlap)
        .as[(Long, Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").toSeq
        val chunks = got(id).map(_._5.split(" ").toSeq).toSeq
        val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(overlap))
        assert(rebuilt == toks,
          s"chunk=$chunk overlap=$overlap doc=$id reconstruction failed")
        // every chunk past the first contributes tokens beyond the
        // overlap — i.e. is never fully contained in its predecessor
        chunks.tail.foreach(c => assert(c.size > overlap,
          s"redundant tail chunk at chunk=$chunk overlap=$overlap doc=$id"))
      }
    }
  }

  test("stripDupSpans removes exactly the tokens covered by cross-doc " +
    "duplicate trigrams; unique docs unchanged; fully-shared docs empty") {
    val boiler = "all rights reserved worldwide"
    val docs = Seq(
      (1L, s"unique alpha prose here $boiler closing words"),
      (2L, s"different beta content $boiler trailing bits"),
      (3L, "completely original text with no duplication at all"),
      (4L, boiler), // fully covered by the shared gram run
      (5L, boiler)
    ).toDF("doc_id", "text")
    val got = CorpusOps.stripDupSpans(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // docs 1/2: the 4 boilerplate tokens are covered by shared trigrams
    // ("all rights reserved" and "rights reserved worldwide" only — the
    // grams spanning into the distinct surroundings are unique per doc)
    assert(got(1L)._4 == "unique alpha prose here closing words")
    assert(got(2L)._4 == "different beta content trailing bits")
    assert(got(1L)._2 - got(1L)._3 == 4) // exactly the boilerplate dropped
    assert(got(3L)._4 == "completely original text with no duplication at all")
    assert(got(3L)._2 == got(3L)._3)
    assert(got(4L)._3 == 0 && got(4L)._4 == "")
  }

  test("corpusDiff labels added/removed/changed/unchanged correctly") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val next = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = CorpusOps.corpusDiff(prev, next, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("shardManifest totals reconcile with the packed corpus and the " +
    "checksum detects a single-doc content change") {
    val docs = (1L to 100L).map(i => (i, 10L, s"doc $i body")).toSeq
      .toDF("doc_id", "n_tokens", "text")
    val packed = CorpusOps.packShards(docs, "doc_id", "n_tokens", budget = 300L)
    val m = CorpusOps.shardManifest(packed, "doc_id", "n_tokens",
      xxhash64(col("text")))
    val rows = m.orderBy("shard_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == 100L && rows.map(_._3).sum == 1000L)
    // contiguous id ranges in shard order
    rows.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._5 + 1 == w(1)._4)
    }
    val tweaked = docs.withColumn("text",
      when($"doc_id" === 57L, lit("doc 57 BODY")).otherwise($"text"))
    val m2 = CorpusOps.shardManifest(
      CorpusOps.packShards(tweaked, "doc_id", "n_tokens", budget = 300L),
      "doc_id", "n_tokens", xxhash64(col("text")))
      .orderBy("shard_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val diff = rows.zip(m2).filter { case (a, b) => a._6 != b._6 }
    assert(diff.length == 1 && diff.head._1._4 <= 57L && 57L <= diff.head._1._5)
  }

  test("upsampleMixture: 2.5 epochs → every row 2 or 3 copies with ~half " +
    "getting the third; rates <= 1 reproduce stratifiedSample exactly") {
    val rows = (1L to 2000L).map(i => (i, "books")).toDF("doc_id", "source")
    val up = CorpusOps.upsampleMixture(rows, "doc_id", "source",
        Map("books" -> 2500000L))
      .as[(Long, String, Long)].collect()
    val counts = up.groupBy(_._1).view.mapValues(_.length).toMap
    assert(counts.size == 2000 && counts.values.forall(n => n == 2 || n == 3))
    val frac3 = counts.values.count(_ == 3).toDouble / counts.size
    assert(math.abs(frac3 - 0.5) < 0.05, s"third-copy fraction $frac3")
    // epochs dense 0..n-1 per doc
    up.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq)
    }
    // sub-1 rates: the epoch-0 survivors ARE stratifiedSample's output
    val down = CorpusOps.upsampleMixture(rows, "doc_id", "source",
        Map("books" -> 300000L)).select("doc_id")
      .as[Long].collect().toSet
    val strat = CorpusOps.stratifiedSample(rows, "doc_id", "source",
        Map("books" -> 300000L)).select("doc_id")
      .as[Long].collect().toSet
    assert(down == strat && down.nonEmpty)
  }

  test("capPerGroup: exactly k survivors per big group, all rows kept in " +
    "small groups, selection stable under growth and partitioning") {
    val rows = (1L to 300L).map(i =>
      (i, if (i <= 250) "big" else if (i <= 290) "mid" else "small"))
    val df = rows.toDF("doc_id", "source")
    val capped = CorpusOps.capPerGroup(df, "doc_id", "source", k = 30)
      .as[(String, Long, Long)].collect()
    val byG = capped.groupBy(_._1)
    assert(byG("big").length == 30)
    assert(byG("mid").length == 30)
    assert(byG("small").length == 10) // group smaller than k → all kept
    // ranks dense per group
    byG.values.foreach(g =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq))
    // partitioning does not change the sample
    val repart = CorpusOps.capPerGroup(df.repartition(13), "doc_id",
      "source", k = 30).as[(String, Long, Long)].collect().toSet
    assert(repart == capped.toSet)
    // plan regression: the selection is the bounded-heap aggregator with
    // a map-side partial, never a per-group window sort
    val plan = CorpusOps.capPerGroup(df, "doc_id", "source", k = 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkaggregator"),
      "bounded-heap partial aggregation missing from plan")
    assert(!plan.contains("Window"), "capPerGroup fell back to a window sort")
    // growth stability: adding docs only evicts from the tail — every doc
    // selected from the grown corpus at rank r was either selected before
    // or is a new arrival with a smaller hash
    val grown = df.unionByName(
      (301L to 350L).map(i => (i, "big")).toSeq.toDF("doc_id", "source"))
    val after = CorpusOps.capPerGroup(grown, "doc_id", "source", k = 30)
      .as[(String, Long, Long)].collect().filter(_._1 == "big")
      .map(_._3).toSet
    val before = byG("big").map(_._3).toSet
    // survivors common to both keep their relative hash order; the set
    // difference is exactly (evicted by new arrivals)
    assert((after intersect before).size >= 30 - 50) // sanity
    assert((before diff after).size == (after diff before).size)
  }

  test("chunkDocuments: full token coverage, exact overlap, no chunk " +
    "contained in its predecessor, stable ids") {
    val words = (1 to 107).map(i => s"w$i")
    val docs = Seq(
      (1L, words.mkString(" ")),                 // 107 tokens
      (2L, (1 to 10).map(i => s"x$i").mkString(" ")), // shorter than a chunk
      (3L, "solo")                               // single token
    ).toDF("doc_id", "text")
    val got = CorpusOps.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 32, overlap = 8)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    // doc1: starts 0,24,48,72,96 — last kept because 96+8 < 107
    val c1 = got(1L)
    assert(c1.map(_._3).toSeq == Seq(0L, 24L, 48L, 72L, 96L))
    assert(c1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(c1.init.forall(_._4 == 32L) && c1.last._4 == 11L)
    // consecutive chunks share exactly `overlap` tokens; concatenation
    // covers every token in order
    val toks1 = c1.map(_._5.split(" ").toSeq).toSeq
    toks1.sliding(2).foreach { w =>
      assert(w(0).takeRight(8) == w(1).take(8))
    }
    assert((toks1.head ++ toks1.tail.flatMap(_.drop(8))) == words)

    // short doc → one chunk, whole text; singleton likewise
    assert(got(2L).toSeq == Seq((2L, 0L, 0L, 10L,
      (1 to 10).map(i => s"x$i").mkString(" "))))
    assert(got(3L).toSeq == Seq((3L, 0L, 0L, 1L, "solo")))

    // a doc whose tail start would add nothing new emits no tail chunk:
    // 40 tokens at chunk 32 / stride 24 → start 24 kept (24+8 = 32 < 40);
    // 30 tokens → start 24 dropped (24+8 >= 30)
    val edge = Seq((9L, (1 to 30).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ce = CorpusOps.chunkDocuments(edge, "doc_id", "text", 32, 8)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(ce.length == 1 && ce.head._4 == 30L)
  }

  test("shuffleOrder: contiguous ranks, seed-independent permutations, " +
    "stable across partitionings") {
    val docs = (0L until 50L).toDF("doc_id")
    def ranks(seed: String, parts: Int): Map[Long, Long] =
      CorpusOps.shuffleOrder(docs.repartition(parts), "doc_id", seed)
        .as[(Long, Long)].collect().toMap
    val e1 = ranks("epoch1", 3)
    assert(e1.values.toSeq.sorted == (0L until 50L))
    assert(e1 != ranks("epoch2", 3), "different seeds must permute differently")
    assert(e1 == ranks("epoch1", 7), "rank must not depend on partitioning")
    // not the identity: a hash order that degenerated to sorted ids
    // would mean the md5 never entered the key
    assert(e1.toSeq.sortBy(_._1).map(_._2) != (0L until 50L).toSeq)
  }

  test("sourceOverlap: exact intersection arithmetic, complete matrix " +
    "including zero-overlap pairs") {
    // bigrams (n=2): A = {a b, b c, c d}; B shares {b c, c d} plus {d e};
    // C is disjoint
    val docs = Seq(
      ("A", "a b c d"),
      ("B", "b c d e"),
      ("C", "x y z")).toDF("src", "text")
    val m = CorpusOps.sourceOverlap(docs, "text", "src", n = 2)
      .orderBy("grp_a", "grp_b")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(m == Seq(
      ("A", "B", 3L, 3L, 2L, 2.0 / 3, 2.0 / 3, 0.5),
      ("A", "C", 3L, 2L, 0L, 0.0, 0.0, 0.0),
      ("B", "C", 3L, 2L, 0L, 0.0, 0.0, 0.0)))
  }

  test("gini: even group scores 0, concentrated group 2/3, empty-mass 0") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 1L),
      ("b", 0L), ("b", 0L), ("b", 10L),
      ("z", 0L), ("z", 0L)).toDF("source", "v")
    val got = CorpusOps.giniByGroup(df, "source", "v")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("a", 3L, 3L, 0L, 9L, 0.0),
      // rx = 30, num = 60 − 40 = 20, den = 30
      ("b", 3L, 10L, 20L, 30L, 20.0 / 30.0),
      ("z", 2L, 0L, 0L, 0L, 0.0)))
  }

  test("quantile normalization maps group percentiles onto global values") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L),
      (3L, "b", 5L), (4L, "b", 6L), (5L, "b", 7L))
      .toDF("doc_id", "source", "v")
    val got = CorpusOps.quantileNormalize(df, "source", "doc_id", "v")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSet
    // global sorted = [5,6,7,10,20]; endpoints map to endpoints, b's
    // median maps to the global median
    assert(got == Set(
      (1L, "a", 10L, 1L, 2L, 1L, 5L),
      (2L, "a", 20L, 2L, 2L, 5L, 20L),
      (3L, "b", 5L, 1L, 3L, 1L, 5L),
      (4L, "b", 6L, 2L, 3L, 3L, 7L),
      (5L, "b", 7L, 3L, 3L, 5L, 20L)))
  }

  test("quantile normalization: a singleton group lands on the median") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (9L, "s", 999L))
      .toDF("doc_id", "source", "v")
    val got = CorpusOps.quantileNormalize(df, "source", "doc_id", "v")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "a", 10L, 1L, 2L, 1L, 10L),
      (2L, "a", 20L, 2L, 2L, 3L, 999L),
      (9L, "s", 999L, 1L, 1L, 2L, 20L)))
  }

  test("trimmed mean drops exactly the floor(n·p) tails per side") {
    val df = ((1L to 9L) :+ 1000L).map(("s", _)).toDF("source", "v")
    val got = CorpusOps.trimmedMeanByGroup(df, "source", "v")
      .as[(String, Long, Long, Double)].collect().toSet
    // n = 10, cut = 1 per side → keep ranks 2..9 = values 2..9
    assert(got == Set(("s", 10L, 8L, 5.5)))
    val untrimmed = CorpusOps.trimmedMeanByGroup(df, "source", "v",
        trimPpm = 0L)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(untrimmed == Set(("s", 10L, 10L, 104.5)))
  }
}
