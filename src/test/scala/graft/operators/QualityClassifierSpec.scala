package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Quality classifier: NB counts/evidence exactness, NB log-odds
  * separation, logistic training accuracy + loss descent, and bitwise
  * training determinism under different partitionings (the property that
  * lets the scored output be golden-pinned).
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // clearly separable toy corpus: "reference prose" vs "spam"
  private val goodPhrases = Seq(
    "the committee reviewed the annual report in detail",
    "researchers published results after careful peer review",
    "the library catalog lists journals by subject and year",
    "students attend lectures on history and mathematics",
    "the museum exhibition documents early printing techniques")
  private val spamPhrases = Seq(
    "buy cheap pills now click here limited offer",
    "win money fast casino bonus click click now",
    "cheap deals buy now free offer click today",
    "casino win big bonus free spins click now",
    "limited offer buy pills cheap fast free win")

  private def labeled = (
    goodPhrases.zipWithIndex.map { case (t, i) => (i.toLong, t, true) } ++
      spamPhrases.zipWithIndex.map { case (t, i) =>
        ((i + 100).toLong, t, false)
      }).toDF("doc_id", "text", "label")

  private val holdout = Seq(
    (200L, "the annual lectures on mathematics were published", true),
    (201L, "researchers attend the museum library in detail", true),
    (202L, "click now buy cheap casino pills free offer", false),
    (203L, "win free bonus click limited cheap deals now", false)
  ).toDF("doc_id", "text", "y")

  test("classCounts: exact per-class occurrence counts") {
    val c = QualityClassifier.classCounts(labeled, "text", "label")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(c("the") == (4L, 0L)) // 4 occurrences, all positive
    assert(c("click") == (0L, 5L))
    assert(c("buy") == (0L, 3L))
    assert(c("review") == (1L, 0L))
  }

  test("nbEvidence: exact integer evidence, empty and OOV docs") {
    val counts = QualityClassifier.classCounts(labeled, "text", "label")
    val docs = Seq(
      (1L, "the committee review"), // all in-vocab, positive-leaning
      (2L, "zzz qqq xyzzy"), // all OOV
      (3L, "")).toDF("doc_id", "text") // no tokens
    val e = QualityClassifier.nbEvidence(docs, "doc_id", "text", counts)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect()
    // doc 1: the=(4,0) committee=(1,0) review=(1,0) → pos 6, neg 0
    assert(e(0) == ((1L, 3L, 0L, 6L, 0L, Some(1.0))))
    assert(e(1) == ((2L, 3L, 3L, 0L, 0L, None)))
    assert(e(2) == ((3L, 0L, 0L, 0L, 0L, None)))
  }

  test("nbScore separates held-out good prose from spam") {
    val counts = QualityClassifier.classCounts(labeled, "text", "label")
    val s = QualityClassifier.nbScore(holdout, "doc_id", "text", counts)
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(s == Map(200L -> true, 201L -> true, 202L -> false, 203L -> false))
  }

  test("nbScore keeps zero-token docs, scoring them at the prior " +
    "log-odds (same row contract as nbEvidence)") {
    val counts = QualityClassifier.classCounts(labeled, "text", "label")
    val docs = Seq((1L, "the committee review"), (2L, ""), (3L, "zzz qqq"))
      .toDF("doc_id", "text")
    val s = QualityClassifier.nbScore(docs, "doc_id", "text", counts,
        priorPos = 0.7)
      .orderBy("doc_id").as[(Long, Double, Boolean)].collect()
    assert(s.map(_._1).toSeq == Seq(1L, 2L, 3L), "no doc may drop")
    val prior = math.log(0.7) - math.log(1.0 - 0.7)
    assert(s(1)._2 == prior && s(1)._3 == (prior > 0))
  }

  test("logisticEvidence: integer first-step margin separates the " +
    "classes; featureless docs emit zeros; md5 fid agrees with xxhash " +
    "fid on predictions") {
    val docs = holdout.select($"doc_id", $"text")
      .unionByName(Seq((300L, "")).toDF("doc_id", "text"))
    def preds(fid: Option[org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column]) =
      QualityClassifier.logisticEvidence(labeled, docs, "doc_id", "text",
        "label", dim = 1 << 12, fidOf = fid)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    val ev = preds(None)
    assert(ev.map(r => r._1 -> r._6).toMap ==
      Map(200L -> true, 201L -> true, 202L -> false, 203L -> false,
        300L -> false))
    // the empty doc stays in the output with all-zero evidence
    assert(ev.last == ((300L, 0L, 0L, 0L, 0L, false)))
    // margins are exact integers either hash; predictions agree at this
    // dim (no discriminative collision on the toy corpus)
    val md5ev = preds(Some(QualityClassifier.md5FeatureId(1 << 12)))
    assert(md5ev.map(r => r._1 -> r._6).toSeq == ev.map(r => r._1 -> r._6).toSeq)
  }

  test("logistic training reaches holdout accuracy and loss decreases") {
    val m5 = QualityClassifier.trainLogistic(labeled, "doc_id", "text",
      "label", dim = 1 << 10, epochs = 5, lr = 1.0)
    val m40 = QualityClassifier.trainLogistic(labeled, "doc_id", "text",
      "label", dim = 1 << 10, epochs = 40, lr = 1.0)
    def loss(m: QualityClassifier.LogisticModel): Double = {
      val s = QualityClassifier.scoreLogistic(labeled, "doc_id", "text", m)
        .join(labeled.select(col("doc_id"),
          col("label").cast("double").as("y")), Seq("doc_id"))
      s.select(avg(-(col("y") * log(col("prob")) +
        (lit(1.0) - col("y")) * log(lit(1.0) - col("prob")))))
        .head.getDouble(0)
    }
    assert(loss(m40) < loss(m5), "more epochs must reduce training loss")
    val preds = QualityClassifier.scoreLogistic(holdout, "doc_id", "text", m40)
      .join(holdout.select("doc_id", "y"), Seq("doc_id"))
      .select((col("prob") > 0.5) === col("y")).as[Boolean].collect()
    assert(preds.forall(identity), "holdout must classify perfectly")
  }

  test("logistic training is bitwise-deterministic across partitionings") {
    def train(parts: Int): (Double, Seq[Double]) = {
      val m = QualityClassifier.trainLogistic(labeled.repartition(parts),
        "doc_id", "text", "label", dim = 1 << 10, epochs = 8, lr = 0.7)
      (m.bias, m.weights.toSeq)
    }
    val (b1, w1) = train(1)
    val (b7, w7) = train(7)
    assert(b1 == b7, "bias must match bitwise")
    assert(w1 == w7, "weights must match bitwise")
  }

  test("model save/load round-trips bitwise: identical scores") {
    val m = QualityClassifier.trainLogistic(labeled, "doc_id", "text",
      "label", dim = 1 << 10, epochs = 8, lr = 0.7)
    val dir = java.nio.file.Files.createTempDirectory("qc-model")
    dir.toFile.deleteOnExit()
    val path = dir.resolve("m").toString
    QualityClassifier.saveModel(spark, m, path)
    val m2 = QualityClassifier.loadModel(spark, path)
    assert(m2.dim == m.dim && m2.bias == m.bias)
    assert(m2.weights.toSeq == m.weights.toSeq)
    val a = QualityClassifier.scoreLogistic(holdout, "doc_id", "text", m)
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    val b = QualityClassifier.scoreLogistic(holdout, "doc_id", "text", m2)
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("qualityFilter keeps reference-like docs, drops spam-like docs") {
    val corpus = holdout.select("doc_id", "text")
    val kept = QualityClassifier.qualityFilter(corpus, "doc_id", "text",
      labeled, "label", minProb = 0.5, dim = 1 << 10, epochs = 40, lr = 1.0)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(200L, 201L))
  }
}
