package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hamilton apportionment invariants (exact total, within-one-of-exact
  * proportionality, determinism, no Alabama-paradox drift on the fixed
  * corpus) and the hash-rank draw's contracts.
  */
class StratifiedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 strata with sizes 7 / 3 / 2 (N = 12)
  private def corpus = (1L to 12L).map { i =>
    val g = if (i <= 7) "a" else if (i <= 10) "b" else "c"
    (i, g)
  }.toDF("id", "grp")

  test("quotas sum exactly to total and differ from exact share by < 1") {
    for (total <- Seq(1L, 5L, 10L, 11L, 12L)) {
      val q = Stratified.allocate(corpus, Seq("grp"), total)
        .collect().map(r => (r.getAs[String]("grp"),
          r.getAs[Long]("n_rows"), r.getAs[Long]("quota"))).toSeq
      assert(q.map(_._3).sum == total, s"total=$total")
      q.foreach { case (g, n, quota) =>
        val exact = total.toDouble * n / 12
        assert(quota >= math.floor(exact) && quota <= math.ceil(exact),
          s"total=$total grp=$g quota=$quota exact=$exact")
      }
    }
  }

  test("hand-checked Hamilton quotas: sizes 7/3/2, total 10") {
    // exact shares 5.833/2.5/1.667, floors 5/2/1 (Σ=8), remainders
    // .833/.5/.667 → the 2 leftover go to a then c
    val q = Stratified.allocate(corpus, Seq("grp"), 10L)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("quota"))
      .toMap
    assert(q == Map("a" -> 6L, "b" -> 2L, "c" -> 2L))
  }

  test("remainder ties break by stratum key ascending") {
    // sizes 1/1 with total 1: both rem = 1·1 mod 2 = 1 → 'a' wins
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "grp")
    val q = Stratified.allocate(df, Seq("grp"), 1L)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("quota"))
      .toMap
    assert(q == Map("a" -> 1L, "b" -> 0L))
  }

  test("sample returns exactly total rows, quota per stratum, and is " +
      "deterministic under repartitioning") {
    val s1 = Stratified.sample(corpus, "id", Seq("grp"), 10L)
      .select("id").as[Long].collect().toSet
    val s2 = Stratified.sample(corpus.repartition(7), "id", Seq("grp"), 10L)
      .select("id").as[Long].collect().toSet
    assert(s1.size == 10 && s1 == s2)
    val perStratum = Stratified.sample(corpus, "id", Seq("grp"), 10L)
      .groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum == Map("a" -> 6L, "b" -> 2L, "c" -> 2L))
  }

  test("sample membership is monotone-stable: a doc keeps its rank as " +
      "unrelated strata grow") {
    // adding docs to stratum c must not change which 'a' docs are drawn
    // (ranks are within-stratum; quota for a unchanged: 6 of 10)
    // adding docs to stratum c can shrink a's quota (10·7/14 = 5) but
    // must not reshuffle a's within-stratum ranking: the draws nest
    val grown = corpus.union(Seq((13L, "c"), (14L, "c")).toDF("id", "grp"))
    val qa = Stratified.allocate(grown, Seq("grp"), 10L)
      .filter(col("grp") === "a").select("quota").as[Long].head()
    val before = Stratified.sample(corpus, "id", Seq("grp"), 10L)
      .filter(col("grp") === "a").select("id").as[Long].collect().toSet
    val after = Stratified.sample(grown, "id", Seq("grp"), 10L)
      .filter(col("grp") === "a").select("id").as[Long].collect().toSet
    assert(after.size == qa)
    assert(after.subsetOf(before) || before.subsetOf(after))
  }

  test("total larger than the corpus draws every row") {
    val out = Stratified.sample(corpus, "id", Seq("grp"), 50L)
      .select("id").as[Long].collect().toSet
    assert(out == (1L to 12L).toSet)
  }

  // --- PPS order sampling (sequential Poisson) ---

  /** The operator's portable uniform: md5-hex chars 20..32 of the id. */
  private def u52(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(19, 32), 16)
  }

  private def weighted = (1L to 12L).map(i => (i, i % 4 + 1)).toDF("id", "wt")

  test("ppsSample matches the brute-force k-smallest quantized keys and " +
      "is deterministic under repartitioning") {
    val expected = (1L to 12L)
      .map(i => (i, u52(i) * 2048 / (i % 4 + 1)))
      .sortBy { case (id, key) => (key, id) }.take(5).map(_._1).toSet
    val got = Stratified.ppsSample(weighted, "id", col("wt"), 5)
      .select("id").as[Long].collect().toSet
    val got2 = Stratified.ppsSample(weighted.repartition(7), "id",
      col("wt"), 5).select("id").as[Long].collect().toSet
    assert(got == expected && got2 == expected)
  }

  test("ppsSample: overwhelming weight forces inclusion; nonpositive " +
      "weight excludes") {
    val df = (1L to 12L).map(i =>
      (i, if (i == 7L) 1000000L else if (i == 3L) 0L else 1L))
      .toDF("id", "wt")
    val ids = Stratified.ppsSample(df, "id", col("wt"), 3)
      .select("id").as[Long].collect().toSet
    assert(ids.contains(7L))   // key ≈ u/10^6: beats every unit weight
    assert(!ids.contains(3L))  // zero weight → no selection mass
  }

  test("ppsSamplePerStratum ranks 1..k within each stratum by the same " +
      "key order") {
    val df = (1L to 12L).map { i =>
      val g = if (i <= 7) "a" else "b"
      (i, g, i % 4 + 1)
    }.toDF("id", "grp", "wt")
    val out = Stratified.ppsSamplePerStratum(df, "id", Seq("grp"),
        col("wt"), 3)
      .select("grp", "id", "pps_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.count(_._1 == "a") == 3 && out.count(_._1 == "b") == 3)
    val expectA = (1L to 7L).map(i => (i, u52(i) * 2048 / (i % 4 + 1)))
      .sortBy { case (id, key) => (key, id) }.take(3).map(_._1)
    assert(out.filter(_._1 == "a").sortBy(_._3).map(_._2).toSeq == expectA)
  }

  test("pps reserved working names fail loudly") {
    val bad = Seq((1L, 2L)).toDF("id", "pps_key")
    intercept[IllegalArgumentException] {
      Stratified.ppsSample(bad, "id", lit(1L), 1)
    }
  }
}
