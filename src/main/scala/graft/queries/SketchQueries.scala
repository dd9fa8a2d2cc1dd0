package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{CardinalitySketch, CountMinSketch, QuantileHistogram}
import graft.queries.Q._

/** Oracle-checked queries for the sketch tier: KMV and HLL distinct
  * counting over the `documents` token stream, the pairwise
  * source-overlap matrix, and Count-Min frequency estimation. Every
  * emitted column — including the ESTIMATES — is exact integer
  * arithmetic over the portable md5-52 hash family, so DuckDB
  * reproduces the sketches bit-for-bit.
  */
object SketchQueries {

  private val K = 256
  private val KmvNumer = (K - 1).toLong << 52
  private val P = 8
  private val W = 52 - P // 44-bit register remainder
  private val HllNumer =
    (BigInt(CardinalitySketch.alphaPpm(P)) * (BigInt(1) << (2 * P + W + 1)))
      .toString
  private val CmsD = 3
  private val CmsM = 512
  private val HistS = 6 // 64 sub-buckets → ≤1.6% relative width
  private val HistQs = Seq(250000L, 500000L, 750000L, 950000L, 990000L)
  private val HistKeyS = 4 // token counts are small; 16 sub-buckets

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

  /** The CMS unit is the same 3-shingle but with OCCURRENCES preserved
    * (`wordShinglesAll`) — a frequency sketch is blind without
    * multiplicity, where a distinct-count sketch is blind TO it.
    */
  private def occurrencesOf(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    t(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(
        graft.functions.TextFunctions.wordShinglesAll(col("text"), 3))
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
      CardinalitySketch.hllEstimate(tokensOf(s, dir), "tok", P)),

    // distinct-count rollup from MERGED per-source sketches: the <all>
    // row's registers are the per-bucket max over per-key states (≤
    // groups×2^p rows merged, zero corpus rescan) — the shippable-sketch
    // property, oracle-checked bit for bit
    "q_hll_rollup" -> ((s, dir) =>
      CardinalitySketch.hllRollup(tokensOf(s, dir), "source", "tok", P)
        .orderBy("key")),

    // Count-Min state: ≤ d×m integer cells regardless of corpus size —
    // the 100 TB replacement for groupBy(token).count()
    "q_cms_state" -> ((s, dir) =>
      CountMinSketch.cmsState(occurrencesOf(s, dir), "tok", CmsD, CmsM)
        .orderBy("row_id", "bucket")),

    // point estimates for the shingles of the first ten documents, with
    // the exact count beside each — the est >= exact one-sided guarantee
    // lands in driver-checked data, and collisions (m=512 against ~16k
    // keys) make est > exact visible
    "q_cms_err" -> ((s, dir) => {
      val stream = occurrencesOf(s, dir)
        .localCheckpoint(true) // consumed by the state AND the exact counts
      val state = CountMinSketch.cmsState(stream, "tok", CmsD, CmsM)
      val probes = t(s, dir, "documents")
        .filter(col("doc_id") < 10 && col("text").isNotNull)
        .select(explode(
          graft.functions.TextFunctions.wordShingles(col("text"), 3))
          .as("tok"))
        .distinct()
      val exact = stream.join(broadcast(probes), Seq("tok"), "left_semi")
        .groupBy("tok").agg(count(lit(1)).as("cnt_exact"))
      CountMinSketch.cmsEstimate(state, probes, "tok", CmsD, CmsM)
        .withColumnRenamed("probe", "tok")
        .join(exact, Seq("tok"))
        .orderBy("tok")
    }),

    // sketch-based join-size estimation: |open orders ⋈ lineitem| from
    // two d×m states and a d×m-row join — never the join itself. The
    // exact join count rides beside as the in-row harness; collisions
    // only add, so est >= n_exact
    "q_cms_join_size" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey").cast("string").as("k"))
      val b = t(s, dir, "lineitem")
        .select(col("l_orderkey").cast("string").as("k"))
      val est = CountMinSketch.cmsInnerProduct(
        CountMinSketch.cmsState(a, "k", CmsD, CmsM),
        CountMinSketch.cmsState(b, "k", CmsD, CmsM), CmsD)
      val exact = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey").as("jk"))
        .join(t(s, dir, "lineitem").select(col("l_orderkey").as("jk")),
          "jk")
        .agg(count(lit(1)).as("n_exact"))
      est.crossJoin(exact)
    }),

    // mergeable log2×2^s quantile histogram over lineitem prices (exact
    // ten-thousandths as longs): the bounded state an exact percentile
    // pass would need a full sort-shuffle to replace
    "q_qhist_state" -> ((s, dir) =>
      QuantileHistogram.histState(priceTenThousandths(s, dir), "v", HistS)
        .orderBy("bucket_id")),

    // quantile resolution from the state alone: rank → bucket, answer
    // sandwiched by real data values within the 2^-s relative bound
    "q_qhist_quantiles" -> ((s, dir) =>
      QuantileHistogram.quantiles(
        QuantileHistogram.histState(priceTenThousandths(s, dir), "v", HistS),
        HistQs)
        .orderBy("q_ppm")),

    // per-source token-length histograms: the distributed per-key form
    // (partitioned cumulative window, no global resolution step)
    "q_qhist_by_source" -> ((s, dir) =>
      QuantileHistogram.histStatePerKey(docTokenCounts(s, dir),
        "source", "n_tokens", HistKeyS)
        .withColumnRenamed("key", "source")
        .orderBy("source", "bucket_id")),

    // per-source p50/p95 from the per-key state
    "q_qhist_source_quantiles" -> ((s, dir) =>
      QuantileHistogram.quantilesPerKey(
        QuantileHistogram.histStatePerKey(docTokenCounts(s, dir),
          "source", "n_tokens", HistKeyS),
        Seq(500000L, 950000L))
        .withColumnRenamed("key", "source")
        .orderBy("source", "q_ppm"))
  )

  private def docTokenCounts(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    t(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("source"),
        asLong(graft.functions.TextFunctions.tokenCountWs(col("text")))
          .as("n_tokens"))

  private def priceTenThousandths(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    t(s, dir, "lineitem").select(
      (dec(col("l_extendedprice")) * 10000).cast("long").as("v"))

  private val TokCte =
    """toks AS (SELECT source, string_split(text, ' ') AS w
      |  FROM documents WHERE text IS NOT NULL),
      |sh AS (SELECT source, unnest(list_transform(
      |    range(1, greatest(len(w) - 1, 1)),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok FROM toks),
      |h AS (SELECT source,
      |  ('0x' || substr(md5(tok), 20, 13))::BIGINT AS h FROM sh)""".stripMargin

  /** All shingle OCCURRENCES (no dedup) + the seeded CMS cell per hash
    * row: bucket_i(tok) = md5("i|" ++ tok)[52-bit] % m.
    */
  private val CmsCte =
    s"""toks AS (SELECT string_split(text, ' ') AS w
       |  FROM documents WHERE text IS NOT NULL),
       |sh AS (SELECT unnest(list_transform(
       |    range(1, greatest(len(w) - 1, 1)),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok FROM toks),
       |rows_ AS (SELECT CAST(unnest([0, 1, 2]) AS BIGINT) AS row_id),
       |cells AS (SELECT r.row_id, s.tok,
       |  ('0x' || substr(md5(CAST(r.row_id AS VARCHAR) || '|' || s.tok),
       |    20, 13))::BIGINT % $CmsM AS bucket
       |  FROM sh s CROSS JOIN rows_ r),
       |st AS (SELECT row_id, bucket, CAST(count(*) AS BIGINT) AS cnt
       |  FROM cells GROUP BY row_id, bucket)""".stripMargin

  /** The HdrHistogram bucket rule over exact price ten-thousandths:
    * v < 2^s keeps its own bucket; otherwise the top s+1 bits index
    * `(msb−s)·2^s + (v >> (msb−s))`.
    */
  private val HistCte =
    s"""v AS (SELECT (CAST(l_extendedprice AS DECIMAL(18,4))
       |    * 10000)::BIGINT AS v FROM lineitem),
       |b AS (SELECT v,
       |    CASE WHEN v < ${1L << HistS} THEN v
       |      ELSE (length(bin(v)) - 1 - $HistS) * ${1L << HistS}
       |        + (v >> (length(bin(v)) - 1 - $HistS)) END AS bucket_id
       |  FROM v),
       |st AS (SELECT bucket_id, CAST(count(*) AS BIGINT) AS cnt,
       |    min(v) AS v_min, max(v) AS v_max
       |  FROM b GROUP BY bucket_id)""".stripMargin

  /** The same bucket rule per source over doc token counts (s=4). */
  private val KeyHistCte =
    s"""d AS (SELECT source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS v
       |  FROM documents WHERE text IS NOT NULL),
       |b AS (SELECT source, v,
       |    CASE WHEN v < ${1L << HistKeyS} THEN v
       |      ELSE (length(bin(v)) - 1 - $HistKeyS) * ${1L << HistKeyS}
       |        + (v >> (length(bin(v)) - 1 - $HistKeyS)) END AS bucket_id
       |  FROM d),
       |st AS (SELECT source, bucket_id, CAST(count(*) AS BIGINT) AS cnt,
       |    min(v) AS v_min, max(v) AS v_max
       |  FROM b GROUP BY source, bucket_id)""".stripMargin

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
         |FROM terms""".stripMargin,

    // per-key registers, the <all> merge as a per-bucket max over the
    // per-key STATE (same rows the engine merges), then the shared
    // integer estimate arithmetic per key
    "q_hll_rollup" ->
      s"""WITH $TokCte,
         |rr AS (SELECT source AS key, h // ${1L << W} AS bucket,
         |  CASE WHEN h % ${1L << W} = 0 THEN ${W + 1}
         |       ELSE ${W + 1} - length(bin(h % ${1L << W})) END AS rho
         |  FROM h),
         |st AS (SELECT key, bucket, max(rho) AS max_rho
         |  FROM rr GROUP BY 1, 2),
         |mrg AS (SELECT '<all>' AS key, bucket, max(max_rho) AS max_rho
         |  FROM st GROUP BY 2),
         |allst AS (SELECT * FROM st UNION ALL SELECT * FROM mrg),
         |seen AS (SELECT key, CAST(count(*) AS BIGINT) AS n_seen_buckets,
         |  CAST(sum(1::BIGINT << (${W + 1} - max_rho)) AS BIGINT) AS s_seen
         |  FROM allst GROUP BY 1),
         |terms AS (SELECT key, n_seen_buckets,
         |  s_seen + (${1L << P} - n_seen_buckets) * ${1L << (W + 1)}
         |    AS sum_terms
         |  FROM seen)
         |SELECT key, n_seen_buckets, sum_terms,
         |  ($HllNumer::HUGEINT
         |    // (sum_terms::HUGEINT * 1000000))::BIGINT AS dv_raw
         |FROM terms ORDER BY key""".stripMargin,

    "q_cms_state" ->
      s"""WITH $CmsCte
         |SELECT row_id, bucket, cnt FROM st
         |ORDER BY row_id, bucket""".stripMargin,

    "q_cms_join_size" ->
      s"""WITH a AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders
         |  WHERE o_orderstatus = 'O'),
         |b AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
         |rows_ AS (SELECT CAST(unnest([0, 1, 2]) AS BIGINT) AS row_id),
         |ca AS (SELECT r.row_id,
         |    ('0x' || substr(md5(CAST(r.row_id AS VARCHAR) || '|' || a.k),
         |      20, 13))::BIGINT % $CmsM AS bucket,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM a CROSS JOIN rows_ r GROUP BY 1, 2),
         |cb AS (SELECT r.row_id,
         |    ('0x' || substr(md5(CAST(r.row_id AS VARCHAR) || '|' || b.k),
         |      20, 13))::BIGINT % $CmsM AS bucket,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM b CROSS JOIN rows_ r GROUP BY 1, 2),
         |dots AS (SELECT ca.row_id, SUM(ca.cnt * cb.cnt) AS dot
         |  FROM ca JOIN cb USING (row_id, bucket) GROUP BY ca.row_id),
         |est AS (SELECT CAST(min(COALESCE(d.dot, 0)) AS BIGINT) AS est
         |  FROM rows_ s LEFT JOIN dots d USING (row_id)),
         |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  WHERE o.o_orderstatus = 'O')
         |SELECT e.est, x.n_exact FROM est e, ex x""".stripMargin,

    "q_qhist_state" ->
      s"""WITH $HistCte
         |SELECT bucket_id, cnt, v_min, v_max FROM st
         |ORDER BY bucket_id""".stripMargin,

    "q_qhist_quantiles" ->
      s"""WITH $HistCte,
         |c AS (SELECT bucket_id, cnt, v_min, v_max,
         |    SUM(cnt) OVER (ORDER BY bucket_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM st),
         |n AS (SELECT max(cum) AS n_total FROM c),
         |q AS (SELECT CAST(unnest([${HistQs.mkString(", ")}]) AS BIGINT)
         |    AS q_ppm),
         |r AS (SELECT q_ppm,
         |    CAST((q_ppm * n_total + 999999) // 1000000 AS BIGINT)
         |      AS "rank"
         |  FROM q, n)
         |SELECT r.q_ppm, r."rank", c.bucket_id, c.v_min, c.v_max
         |FROM r JOIN c ON c.cum >= r."rank" AND c.cum - c.cnt < r."rank"
         |ORDER BY r.q_ppm""".stripMargin,

    "q_qhist_by_source" ->
      s"""WITH $KeyHistCte
         |SELECT source, bucket_id, cnt, v_min, v_max FROM st
         |ORDER BY source, bucket_id""".stripMargin,

    "q_qhist_source_quantiles" ->
      s"""WITH $KeyHistCte,
         |c AS (SELECT source, bucket_id, cnt, v_min, v_max,
         |    SUM(cnt) OVER (PARTITION BY source ORDER BY bucket_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM st),
         |n AS (SELECT source, sum(cnt) AS n_total FROM st GROUP BY source),
         |q AS (SELECT CAST(unnest([500000, 950000]) AS BIGINT) AS q_ppm),
         |r AS (SELECT source, q_ppm,
         |    CAST((q_ppm * n_total + 999999) // 1000000 AS BIGINT)
         |      AS "rank"
         |  FROM n, q)
         |SELECT c.source, r.q_ppm, r."rank", c.bucket_id, c.v_min,
         |  c.v_max
         |FROM c JOIN r ON c.source = r.source
         |  AND c.cum >= r."rank" AND c.cum - c.cnt < r."rank"
         |ORDER BY c.source, r.q_ppm""".stripMargin,

    "q_cms_err" ->
      s"""WITH $CmsCte,
         |pd AS (SELECT string_split(text, ' ') AS w
         |  FROM documents WHERE doc_id < 10 AND text IS NOT NULL),
         |probes AS (SELECT DISTINCT unnest(list_transform(
         |    range(1, greatest(len(w) - 1, 1)),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok FROM pd),
         |pc AS (SELECT p.tok, r.row_id,
         |  ('0x' || substr(md5(CAST(r.row_id AS VARCHAR) || '|' || p.tok),
         |    20, 13))::BIGINT % $CmsM AS bucket
         |  FROM probes p CROSS JOIN rows_ r),
         |est AS (SELECT pc.tok,
         |    CAST(min(COALESCE(st.cnt, 0)) AS BIGINT) AS est
         |  FROM pc LEFT JOIN st USING (row_id, bucket) GROUP BY pc.tok),
         |exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt_exact
         |  FROM sh WHERE tok IN (SELECT tok FROM probes) GROUP BY tok)
         |SELECT e.tok, e.est, x.cnt_exact
         |FROM est e JOIN exact x USING (tok) ORDER BY e.tok""".stripMargin
  )
}
