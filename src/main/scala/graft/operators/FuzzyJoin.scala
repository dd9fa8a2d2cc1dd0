package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
}
