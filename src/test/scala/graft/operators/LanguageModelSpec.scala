package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LanguageModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "the cat ate the fish")).toDF("doc_id", "text")

  test("unigram and bigram counts are exact, minCount prunes the tail") {
    val uni = LanguageModel.unigramCounts(corpus, "text")
      .as[(String, Long)].collect().toMap
    assert(uni("the") == 6L && uni("cat") == 2L && uni("fish") == 1L)
    val bi = LanguageModel.bigramCounts(corpus, "text")
      .as[(String, Long)].collect().toMap
    assert(bi("the cat") == 2L && bi("sat on") == 2L && bi("cat ate") == 1L)
    val pruned = LanguageModel.bigramCounts(corpus, "text", minCount = 2L)
      .as[(String, Long)].collect().toMap
    assert(pruned.values.forall(_ >= 2L) && pruned.contains("sat on")
      && !pruned.contains("cat ate"))
  }

  test("scoreDocs: in-domain text scores higher than gibberish, " +
    "ppl = exp(-avg_logprob), evidence columns are exact") {
    val uni = LanguageModel.unigramCounts(corpus, "text")
    val bi = LanguageModel.bigramCounts(corpus, "text")
    val docs = Seq(
      (10L, "the cat sat on the mat"), // pure training text
      (11L, "the dog ate the fish"),   // in-vocab, mixed bigrams
      (12L, "zx qv wk jj pp"),         // all OOV
      (13L, "single")                  // 1 token → no bigram evidence
    ).toDF("doc_id", "text")
    val got = LanguageModel.scoreDocs(docs, "doc_id", "text", uni, bi)
      .collect().map(r => r.getLong(0) -> r).toMap

    val clean = got(10L)
    assert(clean.getLong(1) == 6L && clean.getLong(2) == 0L) // n_tokens, oov
    assert(clean.getLong(4) == 5L && clean.getLong(5) == 5L) // all bigrams hit
    assert(clean.getDouble(6) == 1.0)

    val oov = got(12L)
    assert(oov.getLong(2) == 5L && oov.getDouble(3) == 1.0) // fully OOV
    assert(oov.getLong(5) == 0L)

    // likelihood orders as expected: trained ≫ mixed ≫ gibberish
    val lp = (id: Long) => got(id).getDouble(7)
    assert(lp(10L) > lp(11L) && lp(11L) > lp(12L))
    // ppl is the exp(-avg_logprob) image
    assert(math.abs(got(11L).getDouble(8) - math.exp(-lp(11L))) < 1e-12)
    // no bigram evidence → null rate/logprob/ppl, but token stats present
    assert(got(13L).getLong(1) == 1L && got(13L).isNullAt(6)
      && got(13L).isNullAt(7) && got(13L).isNullAt(8))
  }

  test("perplexityFilter keeps in-domain docs and drops gibberish") {
    val docs = Seq(
      (10L, "the cat sat on the mat"),
      (12L, "zx qv wk jj pp qq rr")).toDF("doc_id", "text")
    // threshold between the two: clean text sits near ppl 2, gibberish
    // backs off to alpha/total per position → ppl = total/alpha ≈ 42
    val kept = LanguageModel.perplexityFilter(corpus, docs, "doc_id", "text",
      maxPpl = 10.0).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L))
  }

  test("scoreDocs is deterministic across partitioning (broadcast joins, " +
    "map-side aggregation only)") {
    val uni = LanguageModel.unigramCounts(corpus, "text")
    val bi = LanguageModel.bigramCounts(corpus, "text")
    val docs = Seq((10L, "the cat sat on the mat"),
      (11L, "the dog ate the fish")).toDF("doc_id", "text")
    val a = LanguageModel.scoreDocs(docs, "doc_id", "text", uni, bi)
      .orderBy("doc_id").collect().toSeq
    val b = LanguageModel.scoreDocs(docs.repartition(7), "doc_id", "text",
      uni, bi).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("interpolated KN normalizes exactly over the vocabulary for any " +
    "seen context") {
    val uni = LanguageModel.unigramCounts(corpus, "text")
    val bi = LanguageModel.bigramCounts(corpus, "text")
    val vocab = uni.as[(String, Long)].collect().map(_._1)
    // one probe doc per (context, vocab word) — P(w2|w1) summed over the
    // whole vocab must be exactly 1 (the +1/(B+V) continuation floor is
    // constructed to preserve normalization, not just avoid zeros)
    for (w1 <- Seq("the", "sat", "cat")) {
      val probes = vocab.zipWithIndex.map { case (w2, i) =>
        (i.toLong, s"$w1 $w2")
      }.toSeq.toDF("doc_id", "text")
      val total = LanguageModel.knProbStream(probes, "doc_id", "text",
        uni, bi).agg(org.apache.spark.sql.functions.sum($"p"))
        .head.getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9,
        s"sum_vocab P(.|$w1) = $total, want 1.0")
    }
  }

  test("KN normalizes for a context that also occurs document-finally " +
    "(denominator is the context total, not the unigram count)") {
    // "a" ends doc 2, so c1(a)=2 but ctot(a)=1 — dividing by c1 would
    // leave sum_vocab P(.|a) = 0.5 (the round-6 ADVICE bug).
    val kCorpus = Seq((1L, "a b"), (2L, "c a")).toDF("doc_id", "text")
    val uni = LanguageModel.unigramCounts(kCorpus, "text")
    val bi = LanguageModel.bigramCounts(kCorpus, "text")
    val vocab = uni.as[(String, Long)].collect().map(_._1)
    val probes = vocab.zipWithIndex.map { case (w2, i) =>
      (i.toLong, s"a $w2")
    }.toSeq.toDF("doc_id", "text")
    val stream = LanguageModel.knProbStream(probes, "doc_id", "text", uni, bi)
    val total = stream.agg(org.apache.spark.sql.functions.sum($"p"))
      .head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9,
      s"sum_vocab P(.|a) = $total, want 1.0")
    // the evidence columns expose both quantities distinctly
    val row = stream.filter($"w2" === "b")
      .select($"c1", $"ctot").as[(Long, Long)].head()
    assert(row == ((2L, 1L)))
  }

  test("KN continuation beats raw frequency: a word seen in many " +
    "contexts outscores an equally-frequent single-context word after " +
    "an unseen context") {
    // "mat" and "rug" each appear once but follow only "the"; after an
    // UNSEEN context the continuation distribution decides, and a word
    // with more distinct predecessors gets more mass
    val kCorpus = Seq(
      (1L, "a cat sat"), (2L, "b cat sat"), (3L, "c cat sat"),
      (4L, "san francisco"), (5L, "san francisco"), (6L, "san francisco"))
      .toDF("doc_id", "text")
    val uni = LanguageModel.unigramCounts(kCorpus, "text")
    val bi = LanguageModel.bigramCounts(kCorpus, "text")
    val probe = Seq((1L, "zzz cat"), (2L, "zzz francisco"))
      .toDF("doc_id", "text")
    val p = LanguageModel.knProbStream(probe, "doc_id", "text", uni, bi)
      .select($"w2", $"p", $"n_pred").as[(String, Double, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // unigram counts equal (3 each), but cat follows {a,b,c}, francisco
    // only {san}
    assert(p("cat")._2 == 3L && p("francisco")._2 == 1L)
    assert(p("cat")._1 > p("francisco")._1,
      "multi-context word must get more continuation mass")
  }

  test("KN OOV floor: unseen continuation gets 1/(B+V), never zero; " +
    "stream is deterministic across partitioning") {
    val uni = LanguageModel.unigramCounts(corpus, "text")
    val bi = LanguageModel.bigramCounts(corpus, "text")
    val b = bi.count(); val v = uni.count()
    val probe = Seq((1L, "the qqq zzz www")).toDF("doc_id", "text")
    val rows = LanguageModel.knProbStream(probe, "doc_id", "text", uni, bi)
      .orderBy("pos").as[(Long, Long, String, String, Long, Long, Long,
        Long, Long, Double)].collect()
    assert(rows.forall(_._10 > 0.0), "no position may score zero")
    // "the qqq": seen w1, unseen w2 → d·n_succ/ctot · 1/(B+V)
    // "qqq zzz": unseen w1, unseen w2 → bare floor 1/(B+V)
    assert(rows(1)._10 == 1.0 / (b + v))
    val again = LanguageModel.knProbStream(probe.repartition(3), "doc_id",
      "text", uni, bi).orderBy("pos").as[(Long, Long, String, String,
        Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.toSeq == again.toSeq)
    // per-doc roll-up exposes ppl for the filter contract
    val scored = LanguageModel.scoreDocsKn(probe, "doc_id", "text", uni, bi)
      .select("n_bigrams", "hit_bigrams").as[(Long, Long)].head()
    assert(scored == ((3L, 0L)))
    // the composed KN filter separates in-domain text from gibberish
    val docs = Seq((10L, "the cat sat on the mat"),
      (12L, "zx qv wk jj pp qq rr")).toDF("doc_id", "text")
    val kept = LanguageModel.perplexityFilterKn(corpus, docs, "doc_id",
      "text", maxPpl = 10.0).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L))
  }
}
