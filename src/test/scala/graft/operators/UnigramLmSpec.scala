package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "internationalization and international internships " * 10),
    (2L, "the international intern interned internally " * 10),
    (3L, "nations and nationals in international nation states " * 10),
    (4L, "wholly unrelated prose about spark shuffles and columnar io")
  ).toDF("doc_id", "text")

  test("viterbi picks the maximum-likelihood split; ties prefer fewer " +
    "pieces then lexicographic order; equals brute force on short words") {
    val lp = Map("ab" -> math.log(0.25), "a" -> math.log(0.25),
      "b" -> math.log(0.25), "c" -> math.log(0.25))
    // 'ab' as one piece (1 factor) beats 'a'+'b' (2 factors)
    assert(UnigramLm.viterbi(lp, "ab") == Vector("ab"))
    assert(UnigramLm.viterbi(lp, "abc") == Vector("ab", "c"))
    // brute-force cross-check on every split of a short word
    def brute(w: String): Double = {
      if (w.isEmpty) 0.0
      else (1 to w.length).filter(l => lp.contains(w.take(l)))
        .map(l => lp(w.take(l)) + brute(w.drop(l)))
        .foldLeft(Double.NegativeInfinity)(math.max)
    }
    for (w <- Seq("abab", "abcab", "cabba", "abcabc")) {
      val seg = UnigramLm.viterbi(lp, w)
      if (seg.nonEmpty) {
        val got = seg.map(lp).sum
        assert(math.abs(got - brute(w)) < 1e-12,
          s"$w: viterbi $got vs brute ${brute(w)}")
        assert(seg.mkString == w)
      }
    }
  }

  test("trained model: multi-char pieces for recurring morphemes, " +
    "round-trip lossless on every word (unseen chars fall back), " +
    "deterministic across input partitioning") {
    val mdl = UnigramLm.train(corpus, "text", vocabSize = 60, emIters = 3)
    // frequent morphemes won pieces — something longer than a char exists
    assert(mdl.logProbs.keys.exists(_.length >= 3),
      s"no multi-char piece in ${mdl.logProbs.keys.toSeq.sorted}")
    assert(mdl.truncatedWords == 0L)
    // encode: concatenated pieces reproduce each word, even for text with
    // characters the training corpus never saw
    val probe = Seq((10L, "international internships zzzqqq"))
      .toDF("doc_id", "text")
    val rows = UnigramLm.encode(probe, "doc_id", "text", mdl)
      .select("n_words", "n_pieces", "tokens")
      .as[(Int, Int, Seq[String])].collect().head
    assert(rows._1 == 3 && rows._3.mkString.startsWith("international"))
    assert(rows._3.mkString == "internationalinternshipszzzqqq")
    // determinism: same model from a repartitioned corpus
    val mdl2 = UnigramLm.train(corpus.repartition(7), "text",
      vocabSize = 60, emIters = 3)
    assert(mdl.logProbs == mdl2.logProbs)
  }

  test("viterbi-EM does not decrease the table's viterbi likelihood " +
    "round over round") {
    val (table, _) = Bpe.wordTable(corpus, "text", 100000)
    def tableLik(m: UnigramLm.Model): Double =
      table.map { case (w, n) =>
        val seg = UnigramLm.viterbi(m.logProbs, w)
        n * seg.map(m.logProbs).sum
      }.sum
    val liks = (1 to 4).map(it =>
      tableLik(UnigramLm.train(corpus, "text", vocabSize = 60, emIters = it)))
    liks.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"likelihood dropped: $liks")
    }
  }

  test("seedEvidence (the relational oracle face) reproduces the " +
    "trainer's driver-side seed table exactly: same pieces, same " +
    "integer masses, same (score desc, piece) rank order") {
    val vocabSize = 30
    // driver-side replica of train's seeding loop (UnigramLm.train)
    val (table, _) = Bpe.wordTable(corpus, "text", 100000)
    val chars = table.iterator.flatMap(_._1.map(_.toString)).toSet
    val subScore = scala.collection.mutable.HashMap.empty[String, Long]
    table.foreach { case (w, n) =>
      for (i <- 0 until w.length;
           l <- 2 to math.min(8, w.length - i))
        subScore.update(w.substring(i, i + l),
          subScore.getOrElse(w.substring(i, i + l), 0L) + n * l)
    }
    val expected = subScore.toSeq.sortBy { case (p, s) => (-s, p) }
      .take(math.max(0, vocabSize * 4 - chars.size))
      .zipWithIndex.map { case ((p, s), i) => (i + 1L, p, s) }
    val got = UnigramLm.seedEvidence(corpus, "text", vocabSize)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == expected)
  }
}
