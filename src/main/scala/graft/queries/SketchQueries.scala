package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.CardinalitySketch
import graft.queries.Q._

/** Oracle-checked queries for the cardinality-sketch tier: KMV and HLL
  * distinct counting over the `documents` token stream, plus the
  * pairwise source-overlap matrix. Every emitted column — including the
  * ESTIMATES — is exact integer arithmetic over the portable md5-52
  * hash family, so DuckDB reproduces the sketches bit-for-bit.
  */
object SketchQueries {

  private val K = 256
  private val KmvNumer = (K - 1).toLong << 52
  private val P = 8
  private val W = 52 - P // 44-bit register remainder
  private val HllNumer =
    (BigInt(CardinalitySketch.alphaPpm(P)) * (BigInt(1) << (2 * P + W + 1)))
      .toString

  /** The sketched unit is the word 3-shingle, not the unigram — the
    * synthetic corpus draws tokens from a tiny closed vocabulary, while
    * its shingle space (~16k at sf0.01) actually exercises the
    * estimators. Per-doc shingle dedup (wordShingles is distinct within
    * a document) is invisible to a distinct-count sketch, so the oracle
    * skips it.
    */
  private def tokensOf(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("source"),
        explode(graft.functions.TextFunctions.wordShingles(col("text"), 3))
          .as("tok"))

  val queries: Map[String, QueryFn] = Map(
    // global vocabulary estimate: one bounded aggregation, no distinct
    // shuffle — the 100 TB replacement for count(DISTINCT token)
    "q_kmv_vocab" -> ((s, dir) =>
      CardinalitySketch.kmvEstimate(tokensOf(s, dir), "tok", K)),

    // pairwise source overlap via sketch union + inclusion-exclusion:
    // O(sources² × k) regardless of corpus size
    "q_kmv_overlap" -> ((s, dir) =>
      CardinalitySketch.kmvOverlap(tokensOf(s, dir), "source", "tok", K)
        .orderBy("key_a", "key_b")),

    // HLL registers: ≤2^p rows of exact (bucket, max_rho) state
    "q_hll_state" -> ((s, dir) =>
      CardinalitySketch.hllState(tokensOf(s, dir), "tok", P)
        .orderBy("bucket")),

    // raw HLL estimate in scaled-integer arithmetic, with the exact
    // distinct count beside it as the in-row correctness harness
    "q_hll_estimate" -> ((s, dir) =>
      CardinalitySketch.hllEstimate(tokensOf(s, dir), "tok", P))
  )

  private val TokCte =
    """toks AS (SELECT source, string_split(text, ' ') AS w
      |  FROM documents WHERE text IS NOT NULL),
      |sh AS (SELECT source, unnest(list_transform(
      |    range(1, greatest(len(w) - 1, 1)),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok FROM toks),
      |h AS (SELECT source,
      |  ('0x' || substr(md5(tok), 20, 13))::BIGINT AS h FROM sh)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_kmv_vocab" ->
      s"""WITH $TokCte,
         |hd AS (SELECT DISTINCT h FROM h),
         |st AS (SELECT h FROM hd ORDER BY h LIMIT $K),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_state,
         |  max(h) AS kth_hash FROM st)
         |SELECT n_state, kth_hash,
         |  CASE WHEN n_state < $K THEN n_state
         |       ELSE $KmvNumer // greatest(kth_hash, 1) END AS dv_est
         |FROM agg""".stripMargin,

    "q_kmv_overlap" ->
      s"""WITH $TokCte,
         |hd AS (SELECT DISTINCT source AS key, h FROM h),
         |rk AS (SELECT key, h,
         |  row_number() OVER (PARTITION BY key ORDER BY h) AS rn FROM hd),
         |st AS (SELECT key, h FROM rk WHERE rn <= $K),
         |es AS (SELECT key, CAST(count(*) AS BIGINT) AS n_state,
         |  max(h) AS kth FROM st GROUP BY key),
         |dv AS (SELECT key,
         |  CASE WHEN n_state < $K THEN n_state
         |       ELSE $KmvNumer // greatest(kth, 1) END AS dv_est FROM es),
         |pairs AS (SELECT a.key AS key_a, b.key AS key_b,
         |  a.dv_est AS dv_a, b.dv_est AS dv_b
         |  FROM dv a JOIN dv b ON a.key < b.key),
         |ur AS (SELECT p.key_a, p.key_b, s.h
         |    FROM pairs p JOIN st s ON s.key = p.key_a
         |  UNION
         |  SELECT p.key_a, p.key_b, s.h
         |    FROM pairs p JOIN st s ON s.key = p.key_b),
         |urk AS (SELECT key_a, key_b, h,
         |  row_number() OVER (PARTITION BY key_a, key_b ORDER BY h) AS rn
         |  FROM ur),
         |ust AS (SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS n_state,
         |  max(h) AS kth FROM urk WHERE rn <= $K GROUP BY key_a, key_b),
         |uv AS (SELECT key_a, key_b,
         |  CASE WHEN n_state < $K THEN n_state
         |       ELSE $KmvNumer // greatest(kth, 1) END AS dv_union FROM ust)
         |SELECT p.key_a, p.key_b, p.dv_a, p.dv_b, u.dv_union,
         |  greatest(0, p.dv_a + p.dv_b - u.dv_union) AS dv_intersect
         |FROM pairs p
         |JOIN uv u ON p.key_a = u.key_a AND p.key_b = u.key_b
         |ORDER BY p.key_a, p.key_b""".stripMargin,

    "q_hll_state" ->
      s"""WITH $TokCte,
         |br AS (SELECT h // ${1L << W} AS bucket,
         |  h % ${1L << W} AS rem FROM h),
         |rr AS (SELECT bucket,
         |  CASE WHEN rem = 0 THEN ${W + 1}
         |       ELSE ${W + 1} - length(bin(rem)) END AS rho FROM br)
         |SELECT bucket, CAST(max(rho) AS BIGINT) AS max_rho
         |FROM rr GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_hll_estimate" ->
      s"""WITH $TokCte,
         |br AS (SELECT h, h // ${1L << W} AS bucket,
         |  h % ${1L << W} AS rem FROM h),
         |rr AS (SELECT bucket,
         |  CASE WHEN rem = 0 THEN ${W + 1}
         |       ELSE ${W + 1} - length(bin(rem)) END AS rho FROM br),
         |state AS (SELECT bucket, max(rho) AS max_rho
         |  FROM rr GROUP BY bucket),
         |seen AS (SELECT CAST(count(*) AS BIGINT) AS n_seen_buckets,
         |  CAST(sum(1::BIGINT << (${W + 1} - max_rho)) AS BIGINT) AS s_seen
         |  FROM state),
         |ex AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS dv_exact FROM h),
         |terms AS (SELECT n_seen_buckets,
         |  s_seen + (${1L << P} - n_seen_buckets) * ${1L << (W + 1)}
         |    AS sum_terms, dv_exact
         |  FROM seen, ex)
         |SELECT n_seen_buckets, sum_terms,
         |  ($HllNumer::HUGEINT
         |    // (sum_terms::HUGEINT * 1000000))::BIGINT AS dv_raw,
         |  dv_exact
         |FROM terms""".stripMargin
  )
}
