package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(lines: String*) = lines.toDF("text")

  test("likelihood argmax beats raw frequency") {
    // "th" appears 6x but t,h are everywhere; "qu" appears 3x from rare
    // symbols — WordPiece must pick (q, ##u) where BPE would pick the
    // frequent pair. Construct: many th-words with extra t/h mass,
    // plus qu-words where q and u appear ONLY together.
    val df = corpus(
      "the the the thin thin that tot hat hot tat hit tit",
      "quiz quit quay")
    val (m, trace) = WordPiece.trainTrace(df, "text", numMerges = 1)
    assert(m.merges.head == ("q", "##u"), s"got ${m.merges.head}")
    val (_, _, _, cnt, ua, ub) = trace.head
    assert(cnt == 3L && ua == 3L && ub >= 3L)
    // BPE on the same corpus picks a frequency-max pair instead
    val bpe = Bpe.train(df, "text", numMerges = 1)
    assert(bpe.merges.head != ("q", "u"))
  }

  test("merged symbols keep the continuation prefix of their left part") {
    val df = corpus("zab zab zab zab")
    val (m, _) = WordPiece.trainTrace(df, "text", numMerges = 3)
    // symbols z,##a,##b: some merge order; after 2 merges the word is
    // one piece "zab" (initial, no ##)
    assert(m.merges.size >= 2)
    val pieces = m.merges.map { case (a, b) => a + b.stripPrefix("##") }
    assert(pieces.contains("zab") ||
      pieces.count(_.startsWith("##")) + pieces.count(!_.startsWith("##")) ==
        pieces.size)
    assert(m.merges.forall { case (_, b) => b.startsWith("##") })
  }

  test("trace matches a brute-force reimplementation on a small corpus") {
    val text = "banana bandana cabana banal nab ban anna"
    val df = corpus(text)
    val (_, trace) = WordPiece.trainTrace(df, "text", numMerges = 6)

    // brute force: same word table, BigInt score, same tie rule
    var words: Map[Vector[String], Long] = text.split(" ")
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .map { case (w, n) =>
        (w.head.toString +: w.tail.map(c => "##" + c).toVector) -> n
      }
    val expect = Vector.newBuilder[(String, String, Long, Long, Long)]
    for (_ <- 1 to 6) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sc = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (syms, n) =>
        syms.foreach(s => sc.update(s, sc.getOrElse(s, 0L) + n))
        syms.zip(syms.tail).foreach(p =>
          pc.update(p, pc.getOrElse(p, 0L) + n))
      }
      val cands = pc.toSeq.filter(_._2 >= 2).map { case ((a, b), c) =>
        ((BigInt(c) << 40) / (BigInt(sc(a)) * sc(b)), a, b, c)
      }
      if (cands.nonEmpty) {
        val (_, a, b, c) = cands.sortBy { case (q, a, b, _) =>
          (-q, a, b)
        }.head
        expect += ((a, b, c, sc(a), sc(b)))
        val merged = a + b.stripPrefix("##")
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += merged; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), n)
        }
      }
    }
    assert(trace.map(t => (t._2, t._3, t._4, t._5, t._6)) == expect.result())
  }

  test("greedy encode: longest match first, unknown chars pass through") {
    val m = WordPiece.Model(
      Vector(("u", "##n"), ("un", "##i"), ("##b", "##l")), 0L)
    // vocab: un, uni, ##bl
    assert(WordPiece.encodeWord(m, "unible") ==
      Vector("uni", "##bl", "##e"))
    assert(WordPiece.encodeWord(m, "xyz") ==
      Vector("x", "##y", "##z"))
    assert(WordPiece.encodeWord(m, "") == Vector.empty)
  }

  test("deterministic across partitionings") {
    val df = corpus("alpha beta gamma alpha beta alpha")
    val a = WordPiece.trainTrace(df, "text", 5)._2
    val b = WordPiece.trainTrace(df.repartition(7), "text", 5)._2
    assert(a == b)
  }
}
