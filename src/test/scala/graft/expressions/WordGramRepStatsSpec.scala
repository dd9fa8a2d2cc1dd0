package graft.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WordGramRepStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kernelCol(text: org.apache.spark.sql.Column, ns: Seq[Int]) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WordGramRepStats(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), ns))

  /** The relational chain the kernel collapses (ngramRepetition's
    * pre-r13 occ → counts → perN), built from the occurrence-level
    * [[WordGramMd5]] kernel whose own parity vs the composed
    * slice/concat_ws/md5/conv form is pinned in WordGramMd5Spec —
    * so this spec pins kernel == groupBy(doc,n,h) fold exactly. */
  private def relational(df: DataFrame, ns: Seq[Int]): DataFrame = {
    val occ = df.select(col("id").as("__doc"),
      explode(org.apache.spark.sql.graftbridge.ColumnBridge.column(
        WordGramMd5(org.apache.spark.sql.graftbridge.ColumnBridge
          .expression(col("t")), ns))).as("__g"))
      .select(col("__doc"), col("__g.n").as("n"),
        col("__g.h").as("h"), col("__g.glen").as("glen"))
    occ.groupBy(col("__doc"), col("n"), col("h"))
      .agg(count(lit(1)).as("c"), max(col("glen")).as("glen"))
      .groupBy(col("__doc"), col("n"))
      .agg(
        min(struct((-col("c")).as("negc"), col("h"), col("glen")))
          .as("__top"),
        sum(when(col("c") >= 2, col("c") * col("glen"))
          .otherwise(lit(0L))).as("dupchars"))
      .select(col("__doc"), col("n"),
        ((-col("__top.negc")) * col("__top.glen")).as("topchars"),
        col("dupchars"))
  }

  private def viaKernel(df: DataFrame, ns: Seq[Int]): DataFrame =
    df.select(col("id").as("__doc"),
      explode(kernelCol(col("t"), ns)).as("__s"))
      .select(col("__doc"), col("__s.n").as("n"),
        col("__s.topchars").as("topchars"),
        col("__s.dupchars").as("dupchars"))
      // the relational form emits no row when the doc has no n-gram;
      // the kernel emits (n, 0, 0) — align for the compare
      .filter(col("topchars") =!= 0L || col("dupchars") =!= 0L)

  test("kernel == relational groupBy(doc,n,h) fold on fixture docs " +
    "(repeats, ties, multibyte, consecutive spaces)") {
    val docs = Seq(
      (1L, "a b a b a b a b"),            // heavy bigram repetition
      (2L, "x y z x y z x y z tail"),
      (3L, "uno"),                        // shorter than every n
      (4L, "naïve café naïve café naïve café 日本 語 日本 語"),
      (5L, "t t t t t t t t t t"),        // max ties on count
      (6L, "p  q  p  q  p"),              // empty words between doubles
      (7L, "")).toDF("id", "t")
    for (ns <- Seq(Seq(2, 3), Seq(2, 3, 4, 5, 10))) {
      val a = viaKernel(docs, ns).orderBy("__doc", "n").collect().toSeq
      val b = relational(docs, ns).orderBy("__doc", "n").collect().toSeq
      assert(a == b, s"ns=$ns\nkernel:    $a\nrelational: $b")
    }
  }

  test("kernel == relational on 150 seeded random docs (small vocab " +
    "forces real collisions of grams, counts, and ties)") {
    val rnd = new scala.util.Random(13L)
    val vocab = Vector("a", "bb", "ccc", "δδ", "🙂")
    val docs = (0 until 150).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("id", "t")
    val ns = Seq(2, 3, 5)
    val a = viaKernel(docs, ns).orderBy("__doc", "n").collect().toSeq
    val b = relational(docs, ns).orderBy("__doc", "n").collect().toSeq
    assert(a == b)
  }

  test("emits one entry per requested n, zeros when the doc is too " +
    "short, null for null text") {
    val rows = Seq((1L, Some("a b")), (2L, None))
      .toDF("id", "t")
      .select(col("id"), kernelCol(col("t"), Seq(2, 3)).as("s"))
      .orderBy("id").collect()
    val s1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(s1.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))) ==
      Seq((2, 3L, 0L), (3, 0L, 0L))) // one unique bigram: topchars=len("a b")
    assert(rows(1).isNullAt(1))
  }
}
