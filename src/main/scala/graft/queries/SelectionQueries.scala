package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.ImportanceResampling
import graft.queries.Q._

/** Queries for DSIR-style data selection: hashed-n-gram importance
  * weights of every document against the English slice as the target
  * distribution, and the deterministic Gumbel-top-k draw.
  *
  * Gate split: `q_dsir_evidence` carries the EXACT integer sufficient
  * statistics (per-doc bucket counts × both models) to the DuckDB
  * oracle, and `q_dsir_modweights` carries the FULL rational weight
  * value as order-free modular products (num/den mod 2^61−1) — so the
  * weight itself, not just its inputs, is oracle-proven. The float
  * weight/selection faces are pure functions of that evidence but fold
  * hundreds of `ln` terms per doc — measured cross-engine drift of a
  * few ulps — so they stay golden-pinned (GoldenPinSpec); the only
  * engine-specific step left is the single rational→double `ln` at the
  * output edge.
  */
object SelectionQueries {

  private val Dim = 4096

  val queries: Map[String, QueryFn] = Map(
    // the oracle face: exact per-doc × per-bucket model statistics
    "q_dsir_evidence" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      ImportanceResampling.importanceEvidence(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text", Dim)
        .orderBy("doc", "bucket")
    }),

    // the EXACT weight under the oracle: num/den of the rational
    // importance weight mod 2^61-1 — order-free modular folds over the
    // same evidence rows, so the full weight value (not just its
    // sufficient statistics) hash-compares; only rational→double ln
    // stays engine-specific (pinned float faces below).
    "q_dsir_modweights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      ImportanceResampling.modWeightsFromEvidence(
        ImportanceResampling.importanceEvidence(
          docs, docs.filter(col("lang") === "en"), "doc_id", "text", Dim),
        Dim)
        .orderBy("doc")
    }),

    // log importance weight of EVERY raw doc under target=en vs raw=all
    "q_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      ImportanceResampling.logImportanceWeights(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text", Dim)
        .orderBy("doc")
    }),

    // Gumbel-top-k selection: sample ∝ weight, hash-deterministic
    "q_dsir_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      ImportanceResampling.gumbelTopK(
        ImportanceResampling.logImportanceWeights(
          docs, docs.filter(col("lang") === "en"), "doc_id", "text", Dim),
        k = 50, seed = 42L)
    })
  )

  /** Model CTEs: raw/target hashed-gram count tables, corpus totals,
    * and per-doc bucket counts — mirroring the operator term for term.
    */
  private val EvidenceCte =
    s"""d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
       |rw AS (SELECT doc_id, string_split(text, ' ') AS w FROM d),
       |rg AS (SELECT doc_id, unnest(w || list_transform(range(1, len(w)),
       |    i -> w[i] || ' ' || w[i+1])) AS g FROM rw),
       |rb AS (SELECT doc_id,
       |  ('0x' || substr(md5(g), 20, 13))::BIGINT % $Dim AS bucket FROM rg),
       |rcnt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr
       |  FROM rb GROUP BY bucket),
       |tw AS (SELECT string_split(text, ' ') AS w FROM documents
       |  WHERE text IS NOT NULL AND lang = 'en'),
       |tg AS (SELECT unnest(w || list_transform(range(1, len(w)),
       |    i -> w[i] || ' ' || w[i+1])) AS g FROM tw),
       |tb AS (SELECT
       |  ('0x' || substr(md5(g), 20, 13))::BIGINT % $Dim AS bucket FROM tg),
       |tcnt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct
       |  FROM tb GROUP BY bucket),
       |nt AS (SELECT CAST(COALESCE(sum(ct), 0) AS BIGINT) AS n FROM tcnt),
       |nr AS (SELECT CAST(COALESCE(sum(cr), 0) AS BIGINT) AS n FROM rcnt),
       |fb AS (SELECT doc_id AS doc, bucket, CAST(count(*) AS BIGINT) AS f
       |  FROM rb GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dsir_evidence" ->
      s"""WITH $EvidenceCte
         |SELECT fb.doc, fb.bucket, fb.f,
         |  COALESCE(t.ct, 0) AS ct, COALESCE(r.cr, 0) AS cr,
         |  (SELECT n FROM nt) AS n_target, (SELECT n FROM nr) AS n_raw
         |FROM fb LEFT JOIN tcnt t USING (bucket)
         |LEFT JOIN rcnt r USING (bucket)
         |ORDER BY fb.doc, fb.bucket""".stripMargin,

    // the same evidence rows expanded to one row per gram occurrence,
    // each factor reduced mod 2^61-1 via a HUGEINT-safe list_reduce —
    // modular products are order-independent, so no sort is needed.
    "q_dsir_modweights" ->
      s"""WITH $EvidenceCte,
         |ex AS (SELECT fb.doc, fb.f,
         |    COALESCE(t.ct, 0) AS ct, COALESCE(r.cr, 0) AS cr,
         |    (SELECT n FROM nt) AS n_target, (SELECT n FROM nr) AS n_raw
         |  FROM fb LEFT JOIN tcnt t USING (bucket)
         |  LEFT JOIN rcnt r USING (bucket)),
         |rep AS (SELECT doc, ct, cr, n_target, n_raw
         |  FROM ex, unnest(generate_series(1, f))),
         |fac AS (SELECT doc,
         |    CAST((CAST(ct + 1 AS HUGEINT) * (n_raw + $Dim))
         |      % ${ImportanceResampling.ModP} AS BIGINT) AS nf,
         |    CAST((CAST(cr + 1 AS HUGEINT) * (n_target + $Dim))
         |      % ${ImportanceResampling.ModP} AS BIGINT) AS df
         |  FROM rep)
         |SELECT doc, CAST(count(*) AS BIGINT) AS n_grams,
         |  list_reduce(list(nf), (acc, x) -> CAST((CAST(acc AS HUGEINT) * x)
         |    % ${ImportanceResampling.ModP} AS BIGINT)) AS num_mod,
         |  list_reduce(list(df), (acc, x) -> CAST((CAST(acc AS HUGEINT) * x)
         |    % ${ImportanceResampling.ModP} AS BIGINT)) AS den_mod
         |FROM fac GROUP BY doc ORDER BY doc""".stripMargin
  )
}
