package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.TextFunctions

/** Edit-distance self-join via q-gram prefix filtering (the ED-Join
  * family: Gravano et al. 2001 count filtering + Xiao et al. 2008
  * prefix pruning) — entity resolution over short strings (names,
  * titles, identifiers) where `ed(a,b) ≤ k` pairs must be found WITHOUT
  * the quadratic all-pairs pass.
  *
  * Soundness chain, set semantics:
  *   - one edit destroys at most q distinct q-grams, so `ed ≤ k` ⇒
  *     `|Ga \ Gb| ≤ q·k`, i.e. overlap ≥ |Ga| − q·k;
  *   - therefore the first `q·k + 1` grams of each string under ANY
  *     global total order must intersect for a matching pair (the
  *     prefix-filter theorem) — candidates are pairs sharing ≥1 prefix
  *     gram, and NO true pair is missed (proven empirically by the
  *     brute-force oracle of `q_fuzzy_join`).
  * Candidates then pass a length filter (`||a|−|b|| ≤ k`) and the exact
  * `levenshtein` verify — false candidates die, so the output is
  * EXACTLY the true pair set.
  *
  * Scale design: the global gram-frequency table is vocab-bounded and
  * broadcast; prefix selection is a per-string window (partitioned by
  * id, fully distributed); ordering prefixes by ASCENDING global
  * frequency makes the join keys the RAREST grams each string has, so
  * the gram join's fan-out is skew-limited by construction (the
  * classic reason prefix filtering works at scale). Verification cost
  * is |candidates|, not |pairs|².
  */
object FuzzyJoin {

  /** All `ed ≤ maxDist` unordered pairs `(id_a, id_b, dist)` within
    * `df(strCol)`. Null and shorter-than-q strings are skipped (they
    * have no q-grams to index; match them by exact equality upstream if
    * needed).
    */
  def fuzzySelfJoin(df: DataFrame, idCol: String, strCol: String,
      q: Int = 2, maxDist: Int = 1): DataFrame = {
    require(q >= 1 && q <= 8, s"q must be in [1,8], got $q")
    require(maxDist >= 1 && maxDist <= 8,
      s"maxDist must be in [1,8], got $maxDist")
    val prefixLen = q * maxDist + 1
    val base = df
      .filter(col(strCol).isNotNull && length(col(strCol)) >= q)
      .select(col(idCol).cast(LongType).as("id"), col(strCol).as("s"))
    val grams = base.select(col("id"),
        explode(array_distinct(expr(
          s"transform(sequence(1, length(s) - ${q - 1}), " +
            s"i -> substring(s, i, $q))"))).as("gram"))
    val freq = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("gf"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("gf").asc, col("gram").asc)
    val prefixes = grams.join(broadcast(freq), Seq("gram"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= prefixLen)
      .select(col("id"), col("gram"))
    val cands = prefixes.select(col("id").as("id_a"), col("gram"))
      .join(prefixes.select(col("id").as("id_b"), col("gram")), Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cands
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b")).cast(LongType))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** All document pairs with shingle-set Jaccard ≥ τ (τ in ppm — the
    * threshold stays INTEGER end to end) via prefix filtering — the
    * DETERMINISTIC scale path between [[Dedup.minhashDedupPairs]]
    * (complete only probabilistically) and [[Dedup.ngramJaccardPairs]]
    * (exact but quadratic per co-occurring shingle):
    *
    *   - `J(a,b) ≥ τ` ⇒ `|∩| ≥ ⌈τ·|a|⌉`, so the first
    *     `|a| − ⌈τ·|a|⌉ + 1` shingles of each document under a global
    *     total order must intersect the other side's prefix — documents
    *     only meet through their RAREST shingles (frequency-ascending
    *     order), never through stopword-grade shingles;
    *   - candidates pass the length filter (`τ·|b| ≤ |a|`, cross-
    *     multiplied in ppm) and exact verification
    *     (`array_intersect` of the two shingle sets, then the integer
    *     cross-multiplication `10^6·|∩| ≥ τppm·|∪|` — no float
    *     threshold compare anywhere).
    *
    * Output `(id_a, id_b, n_a, n_b, n_common, jaccard)` is EXACTLY the
    * true pair set (the brute-force oracle of `q_ppjoin` proves
    * completeness empirically); `jaccard` is the one exact double
    * division at the edge.
    */
  def setSimilarityJoin(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, tauPpm: Long = 400000L): DataFrame = {
    require(tauPpm >= 1 && tauPpm <= 1000000,
      s"tauPpm must be in [1, 10^6], got $tauPpm")
    val shl = df
      .select(col(idCol).cast(LongType).as("id"),
        TextFunctions.wordShingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true) // consumed by prefixes + both verify sides
    val inv = shl.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
    val freq = inv.groupBy(col("s")).agg(count(lit(1)).as("gf"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("gf").asc, col("s").asc)
    val prefixes = inv.join(freq, Seq("s"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <=
        col("n") - expr(s"(n * ${tauPpm}L + 999999) div 1000000L") + 1)
      .select(col("id"), col("n"), col("s"))
    val cands = prefixes.select(col("id").as("id_a"), col("n").as("n_a"),
        col("s"))
      .join(prefixes.select(col("id").as("id_b"), col("n").as("n_b"),
        col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b") &&
        col("n_a") * tauPpm <= col("n_b") * 1000000L &&
        col("n_b") * tauPpm <= col("n_a") * 1000000L)
      .select(col("id_a"), col("id_b"))
      .distinct()
    cands
      .join(shl.select(col("id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(shl.select(col("id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(col("sh_a")).cast(LongType).as("n_a"),
        size(col("sh_b")).cast(LongType).as("n_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(LongType)
          .as("n_common"))
      .filter(col("n_common") * 1000000L >=
        lit(tauPpm) * (col("n_a") + col("n_b") - col("n_common")))
      .withColumn("jaccard", col("n_common").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("n_common")).cast(DoubleType))
  }
}
