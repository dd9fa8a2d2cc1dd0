package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("first merges are the highest-count pairs with deterministic " +
    "tie-breaks (hand-checked corpus)") {
    val df = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    val m = Bpe.train(df, "text", numMerges = 2)
    // word {aaab: 3} → symbols a a a b</w>; (a,a) counts 6, (a,b</w>) 3;
    // after merging (a,a) → aa a b</w>: (aa,a)=3 ties (a,b</w>)=3 and the
    // lexicographically smaller pair wins
    assert(m.merges == Vector(("a", "a"), ("a", "b</w>")))
  }

  test("training is deterministic across reruns and partitioning; " +
    "frequent words collapse to single tokens; unseen words fall back") {
    val corpus = Seq(
      (1L, "low low low low low lower lower newest newest"),
      (2L, "newest newest newest newest widest widest widest")
    ).toDF("doc_id", "text")
    val m1 = Bpe.train(corpus, "text", numMerges = 50)
    val m2 = Bpe.train(corpus.repartition(5), "text", numMerges = 50)
    assert(m1.merges == m2.merges && m1.merges.nonEmpty)
    // enough merges → every training word is one closed token
    for (w <- Seq("low", "lower", "newest", "widest"))
      assert(Bpe.encodeWord(m1.ranks, w) == Vector(w + Bpe.EndMark),
        s"$w did not collapse")
    // unseen characters fall back to character symbols
    assert(Bpe.encodeWord(m1.ranks, "zq") == Vector("z", "q" + Bpe.EndMark))
    // partially-seen word reuses learned subwords: "lowest" shares "low"
    val lowest = Bpe.encodeWord(m1.ranks, "lowest")
    assert(lowest.head.startsWith("low") && lowest.length >= 2)
  }

  test("encode outputs per-doc word and token counts; compression is " +
    "real on repetitive text; word-table truncation is surfaced") {
    val corpus = Seq(
      (1L, "the quick brown fox the quick brown fox"),
      (2L, "the the the quick quick brown")
    ).toDF("doc_id", "text")
    val m = Bpe.train(corpus, "text", numMerges = 30)
    val enc = Bpe.encode(corpus, "doc_id", "text", m)
      .as[(Long, Int, Int, Seq[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(enc(1L)._2 == 8)
    // all four words trained to closure → one token per word
    assert(enc(1L)._3 == 8 && enc(1L)._4.forall(_.endsWith(Bpe.EndMark)))
    assert(enc(2L)._2 == 6 && enc(2L)._3 == 6)

    val (_, truncated) = Bpe.wordTable(corpus, "text", maxWordTable = 2)
    assert(truncated == 2L) // 4 distinct words, table capped at 2
    val mT = Bpe.train(corpus, "text", numMerges = 10, maxWordTable = 2)
    assert(mT.truncatedWords == 2L)
  }

  test("trainTrace: trace pairs equal the model's merges, steps are " +
    "1..k, counts are the hand-checked argmax winners") {
    val df = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    val (m, trace) = Bpe.trainTrace(df, "text", numMerges = 3)
    assert(trace.map(t => (t._2, t._3)) == m.merges)
    assert(trace.map(_._1) == (1 to trace.length).toVector)
    // {aaab:3}: (a,a) counts 6 (overlapping occurrences both count);
    // then (aa,a)=3 ties (a,b</w>)=3 → lexicographically smaller pair;
    // then (aa,ab</w>) is unique at 3
    assert(trace == Vector((1, "a", "a", 6L), (2, "a", "b</w>", 3L),
      (3, "aa", "ab</w>", 3L)))
  }
}
