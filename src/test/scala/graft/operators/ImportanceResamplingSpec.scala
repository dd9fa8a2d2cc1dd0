package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ImportanceResamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val target = Seq(
    (100L, "alpha beta gamma alpha beta"),
    (101L, "alpha gamma delta beta alpha")).toDF("doc_id", "text")
  private val raw = Seq(
    (0L, "alpha beta gamma alpha"), // target-like
    (1L, "junk noise junk noise junk"), // off-target
    (2L, "alpha junk beta noise"), // mixed
    (3L, null.asInstanceOf[String])).toDF("doc_id", "text")

  test("target-like docs outweigh off-target docs") {
    val w = ImportanceResampling
      .logImportanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w.keySet == Set(0L, 1L, 2L)) // null text excluded
    assert(w(0L) > w(2L) && w(2L) > w(1L))
  }

  test("weights match a driver-side reimplementation exactly") {
    val dim = 4096
    def gramsOf(text: String): Seq[String] = {
      val t = text.split(" ", -1).toSeq
      t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(19, 32), 16) % dim
    }
    val tCounts = Seq("alpha beta gamma alpha beta",
      "alpha gamma delta beta alpha")
      .flatMap(gramsOf).groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
    val rawTexts = Seq(0L -> "alpha beta gamma alpha",
      1L -> "junk noise junk noise junk", 2L -> "alpha junk beta noise")
    val rCounts = rawTexts.flatMap(x => gramsOf(x._2)).groupBy(bucket)
      .map { case (b, g) => b -> g.size.toLong }
    val nT = tCounts.values.sum
    val nR = rCounts.values.sum
    val expected = rawTexts.map { case (id, text) =>
      val fb = gramsOf(text).groupBy(bucket).toSeq.sortBy(_._1)
      val ratio = fb.foldLeft(0.0) { case (acc, (b, g)) =>
        acc + g.size.toDouble * (StrictMath.log(tCounts.getOrElse(b, 0L) + 1.0) -
          StrictMath.log(rCounts.getOrElse(b, 0L) + 1.0))
      }
      val n = fb.map(_._2.size).sum
      id -> (ratio + n *
        (StrictMath.log(nR.toDouble + dim) - StrictMath.log(nT.toDouble + dim)))
    }.toMap
    val got = ImportanceResampling
      .logImportanceWeights(raw, target, "doc_id", "text", dim)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got == expected) // bitwise: same fold order, same ln
  }

  test("weights are partitioning-invariant") {
    val a = ImportanceResampling
      .logImportanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val b = ImportanceResampling
      .logImportanceWeights(raw.repartition(13), target.repartition(7),
        "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("gumbelTopK is deterministic and samples proportionally") {
    val w = Seq((1L, 100.0), (2L, -100.0), (3L, -100.0))
      .toDF("doc", "log_weight")
    val s1 = ImportanceResampling.gumbelTopK(w, k = 2, seed = 7L)
      .as[(Long, Double, Double)].collect()
    val s2 = ImportanceResampling.gumbelTopK(w, k = 2, seed = 7L)
      .as[(Long, Double, Double)].collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.length == 2)
    // an overwhelming weight is always drawn first
    assert(s1.head._1 == 1L)
  }

  test("evidence totals are consistent with the per-bucket rows") {
    val ev = ImportanceResampling
      .importanceEvidence(raw, target, "doc_id", "text").collect()
    val nRaw = ev.head.getLong(6)
    // every gram of every non-null raw doc lands in exactly one bucket
    assert(ev.map(_.getLong(2)).sum == nRaw)
    // cr covers each doc's own contribution: f ≤ cr always
    assert(ev.forall(r => r.getLong(2) <= r.getLong(4)))
  }

  test("modWeightsFromEvidence equals a BigInt reimplementation of the " +
    "exact rational weight mod p, and ln(num/den) equals log_weight") {
    val dim = 4096
    val p = BigInt(ImportanceResampling.ModP)
    val ev = ImportanceResampling
      .importanceEvidence(raw, target, "doc_id", "text", dim)
      .collect()
    val got = ImportanceResampling.modWeightsFromEvidence(
      ImportanceResampling.importanceEvidence(raw, target, "doc_id",
        "text", dim), dim)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val w = ImportanceResampling
      .logImportanceWeights(raw, target, "doc_id", "text", dim)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val byDoc = ev.groupBy(_.getLong(0))
    assert(got.keySet == byDoc.keySet)
    byDoc.foreach { case (doc, rows) =>
      var (num, den, exactNum, exactDen) =
        (BigInt(1), BigInt(1), BigInt(1), BigInt(1))
      var n = 0L
      rows.foreach { r =>
        val (f, ct, cr) = (r.getLong(2), r.getLong(3), r.getLong(4))
        val (nT, nR) = (r.getLong(5), r.getLong(6))
        val nf = BigInt(ct + 1) * BigInt(nR + dim)
        val df = BigInt(cr + 1) * BigInt(nT + dim)
        (0L until f).foreach { _ =>
          num = num * (nf mod p) mod p; den = den * (df mod p) mod p
          exactNum *= nf; exactDen *= df
        }
        n += f
      }
      val (gn, gnum, gden) = got(doc)
      assert(gn == n && gnum == (num mod p).toLong &&
        gden == (den mod p).toLong, s"doc $doc mod-weight diverged")
      // the rational the residues certify IS the float face's weight
      val lnExact = math.log(
        (BigDecimal(exactNum) / BigDecimal(exactDen)).toDouble)
      assert(math.abs(lnExact - w(doc)) < 1e-9,
        s"doc $doc: ln(rational)=$lnExact vs log_weight=${w(doc)}")
    }
  }
}
