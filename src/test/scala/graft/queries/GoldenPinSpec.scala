package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Golden pins for the queries the SQL oracle cannot reach
  * (`no_oracle` in CORRECTNESS): their pipelines are deterministic
  * (hash-seeded signatures, seeded k-means, fixed tie-breakers), so the
  * full output is frozen as a canonical SHA-256 over sorted rows. A pin
  * moving means the operator's OUTPUT changed — a semantic change that
  * must be deliberate, not drift. Containment/recall gates elsewhere
  * prove the outputs are RIGHT; these prove they are STABLE.
  *
  * Regenerate after a deliberate change with:
  * {{{ sbt "Test/runMain graft.queries.GoldenPinGen /root/testdata/sf0.01" }}}
  */
object GoldenPin {
  val sfDir = "/root/testdata/sf0.01"
  val pinned: Seq[String] =
    Seq("q_ann_ivf", "q_ann_ivfpq", "q_ann_lsh", "q_ann_opq", "q_ann_pq",
      "q_ann_sq",
      "q_bpe_tokens", "q_compress_ratio", "q_dedup_minhash",
      "q_dsir_select", "q_dsir_weights",
      "q_quality_logistic", "q_semantic_dedup", "q_simhash_sketch",
      "q_unigram_tokens")

  /** Order-free canonical digest: rows rendered with fixed float
    * formatting, sorted, SHA-256'd. Doubles keep 12 significant digits —
    * exact for these pipelines (sims/jaccards are short dot products and
    * small-integer ratios), while not flaking on a sub-ulp re-association
    * if an upstream reduce tree ever changes shape.
    */
  def canonicalHash(df: DataFrame): (Long, String) = {
    val rows = df.collect().map(_.toSeq.map {
      case null => "∅"
      case d: Double => f"$d%.12e"
      case f: Float => f"$f%.7e"
      case x => x.toString
    }.mkString("|")).sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(rows.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (rows.length.toLong, hex)
  }
}

/** Prints `name rows hash` for each pinned query — paste into the spec. */
object GoldenPinGen {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(GoldenPin.sfDir)
    val spark = TestSpark.spark
    GoldenPin.pinned.foreach { name =>
      val (n, h) = GoldenPin.canonicalHash(SparkEntry.queries(name)(spark, dir))
      println(s"GOLDENPIN $name $n $h")
    }
    spark.stop()
  }
}

class GoldenPinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // sf0.01 pins (the driver's correctness tier)
  private val expected = Map(
    "q_ann_ivf" -> (25L,
      "2ddcd3a4550cc27aab1fd6f5e81fe690834ce6a9c2822667eea94f21ba636a50"),
    "q_ann_ivfpq" -> (25L,
      "28a516033ed252edf2348f7d646823907f1a4f10932255da06ae2d79e074ad4b"),
    "q_ann_lsh" -> (25L,
      "7b4632c658c851a3e6628ee71bb93c74a35dd652f4add06491a835e135ac8c04"),
    "q_ann_opq" -> (25L,
      "0ca525296d4ca4bae3dee07fd8885a7229bf354dabe5b86d5ba371940d640e5d"),
    "q_ann_sq" -> (25L,
      "fc540933a79faf255a4512e2a01c2507b1091bf7f556101ab08c1fdb06060599"),
    "q_bpe_tokens" -> (500L,
      "8c6087702c98f6605558d15ae9c2f325f11bd52fb27a2828444ee7cdfcaca583"),
    "q_compress_ratio" -> (500L,
      "804d9cf36627b05895efffb79fa651f5fd37f7ac57de85280000b1e613fe795c"),
    "q_ann_pq" -> (25L,
      "5065922ff5a70e5e5cc3d5b2d5d81a7bc773d2daf4e01fad21fbe07d09a93f34"),
    "q_dedup_minhash" -> (30L,
      "dcb7bea2b7f79769b78ce9be743abc108d2bd21ac5e0760864364fb94a5e4649"),
    "q_dsir_select" -> (50L,
      "9a11f01689394166414b951ae705a1a5f61b18da83bb71ee016cde22594c2ede"),
    "q_dsir_weights" -> (500L,
      "adb2262fceba880a454d2f038296b53897b4602c927ee6c2cb0b8b9400e2390a"),
    "q_quality_logistic" -> (250L,
      "28714ec450e69aab07738950d23b7bc9e68b4e284df608fc2dc84f307ae576dc"),
    "q_semantic_dedup" -> (259L,
      "6c13bda95686f4cdb73f1d8a81326ef9d6ce8949722b80e34a5c2590da2defc5"),
    "q_simhash_sketch" -> (500L,
      "38fce3cfa21a32646077d0fcfcba305d70468b6447e55e0ae65c220c4b5bd7b8"),
    "q_unigram_tokens" -> (500L,
      "876067aa3bacba2b80ee89a38f6eab4450bb5c2f6312aeafa0afc76705c3282d"))

  GoldenPin.pinned.foreach { name =>
    test(s"$name output is byte-stable vs its golden pin") {
      val (n, h) = GoldenPin.canonicalHash(
        SparkEntry.queries(name)(spark, GoldenPin.sfDir))
      val (en, eh) = expected(name)
      assert(n == en, s"$name row count moved: $n vs pinned $en")
      assert(h == eh, s"$name output hash moved: $h vs pinned $eh")
    }
  }
}
