package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CooccurSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pmiPairs: hand-checked skip-gram counts, marginals, and ratio on " +
    "a micro corpus (window 1)") {
    val docs = Seq("a b a c", "b a").toDF("text")
    val got = Cooccur.pmiPairs(docs, "text", window = 1, minCount = 1)
      .select("a", "b", "c_ab", "c_a", "c_b", "pmi_ratio")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // doc1 pairs: (a,b) (b,a) (a,c); doc2: (b,a). unigrams a=3 b=2 c=1;
    // n_tok=6, n_pairs=4
    assert(got.keySet == Set(("a", "b"), ("b", "a"), ("a", "c")))
    assert(got(("b", "a"))._3 == 2L)
    assert(got(("b", "a"))._4 == 2L && got(("b", "a"))._5 == 3L)
    // (b,a): 2*6*6 / (4*2*3) = 3.0
    assert(got(("b", "a"))._6 == 3.0)
    // (a,b): 1*36 / (4*3*2) = 1.5 ; (a,c): 36 / (4*3*1) = 3.0
    assert(got(("a", "b"))._6 == 1.5)
    assert(got(("a", "c"))._6 == 3.0)
  }

  test("pmiPairs: window 2 adds exactly the distance-2 pairs, and " +
    "pmi == ln(pmi_ratio) on every row") {
    val docs = Seq("x y z").toDF("text")
    val w1 = Cooccur.pmiPairs(docs, "text", window = 1, minCount = 1)
      .select("a", "b").as[(String, String)].collect().toSet
    val w2 = Cooccur.pmiPairs(docs, "text", window = 2, minCount = 1)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(w1 == Set(("x", "y"), ("y", "z")))
    assert(w2 == w1 + (("x", "z")))
    val rows = Cooccur.pmiPairs(Seq("a b a c a b", "b a c").toDF("text"),
      "text", window = 2, minCount = 1)
      .select("pmi_ratio", "pmi").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (r, p) => assert(p == math.log(r)) }
  }

  test("pmiPairs: counts are partitioning-invariant") {
    val docs = (0 until 200)
      .map(i => s"t${i % 7} t${i % 5} t${i % 7} t${i % 3}").toDF("text")
    def run(parts: Int) = Cooccur.pmiPairs(docs.repartition(parts),
      "text", window = 2, minCount = 1)
      .select("a", "b", "c_ab", "pmi_ratio")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(run(1) == run(13))
  }

  test("frequencySpectrum: hand-checked count-of-counts, and the spectrum " +
    "reconciles with the token total") {
    val docs = Seq("a a b", "b c").toDF("text")
    val got = Cooccur.frequencySpectrum(docs, "text")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L)) // c once; a,b twice
    // Σ freq·n_tokens = total token occurrences
    assert(got.map { case (f, n) => f * n }.sum == 5L)
  }

  test("globalOrderIndex: rank equals row_number()-1 under gapped ids, " +
    "skewed values, and any partitioning") {
    val ids = ((0L until 300L) ++ (50000L until 50100L)).sortBy(i => (i * 7919) % 401)
    val df = ids.toDF("doc_id")
    val expected = ids.sorted.zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    for (parts <- Seq(1, 17)) {
      val got = CorpusOps.globalOrderIndex(df.repartition(parts), "doc_id")
        .select("doc_id", "rank").as[(Long, Long)].collect().toMap
      assert(got == expected, s"diverged at parts=$parts")
    }
  }
}
