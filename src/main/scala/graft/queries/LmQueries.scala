package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, LanguageModel, QualityClassifier}
import graft.queries.Q._

/** Oracle-checked queries for the round-5 corpus tier: deterministic
  * domain-mixture sampling, duplicate-span accounting, Bloom-pruned
  * joins, and the stupid-backoff n-gram LM (counts + integer scoring
  * evidence; the floating perplexity itself is spec-gated in
  * LanguageModelSpec, not hash-compared).
  */
object LmQueries {

  val queries: Map[String, QueryFn] = Map(
    // domain reweighting: deterministic per-language keep rates
    // (en 100%, de/es 50%, fr 25%, zh 10%), pure map-side hash filter.
    "q_sample_mixture" -> ((s, dir) =>
      CorpusOps.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 1000000L, "de" -> 500000L, "es" -> 500000L,
          "fr" -> 250000L, "zh" -> 100000L))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")),

    // exact duplicate-span accounting: per doc, how many word-trigram
    // positions are shared with at least one other document.
    "q_dup_spans" -> ((s, dir) =>
      CorpusOps.dupSpans(t(s, dir, "documents"), "doc_id", "text", n = 3)
        .select(col("doc_id"), asLong(col("n_grams")).as("n_grams"),
          asLong(col("n_dup_grams")).as("n_dup_grams"), col("dup_frac"))
        .orderBy("doc_id")),

    // Bloom-pruned fact⋈dim join: identical rows to the plain join (the
    // pruning is a pre-shuffle superset filter), so the plain join IS the
    // oracle; the pruning effectiveness is asserted in BloomPruneSpec.
    "q_bloom_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders").filter(col("o_totalprice") > 150000.0)
      graft.ops.BloomPrune.bloomPrunedJoin(
        t(s, dir, "lineitem"), orders, "l_orderkey", "o_orderkey",
        expectedItems = 100000L)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
        .select(col("o_orderkey"), asLong(col("n_items")).as("n_items"),
          col("revenue"))
        .orderBy("o_orderkey")
    }),

    // bigram LM counts (top-50 under a total order) — the trained model
    // artifact itself, oracle-checked.
    "q_lm_counts" -> ((s, dir) =>
      LanguageModel.bigramCounts(t(s, dir, "documents"), "text")
        .orderBy(col("c").desc, col("bigram")).limit(50)
        .select(col("bigram"), asLong(col("c")).as("c"))),

    // stupid-backoff scoring evidence: train on doc_id < 250, score the
    // rest; integer hit/oov evidence plus single-division rates are
    // engine-exact (avg_logprob/ppl stay spec-gated).
    "q_lm_score" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val train = d.filter(col("doc_id") < 250)
      val uni = LanguageModel.unigramCounts(train, "text")
      val bi = LanguageModel.bigramCounts(train, "text")
      LanguageModel.scoreDocs(d.filter(col("doc_id") >= 250), "doc_id", "text",
        uni, bi)
        .select(col("doc_id"), asLong(col("n_tokens")).as("n_tokens"),
          asLong(col("oov_tokens")).as("oov_tokens"), col("oov_rate"),
          asLong(col("n_bigrams")).as("n_bigrams"),
          asLong(col("hit_bigrams")).as("hit_bigrams"),
          col("bigram_hit_rate"))
        .orderBy("doc_id")
    }),

    // interpolated Kneser-Ney bigram probabilities, per position: every
    // model quantity is an exact relational aggregate and p is a
    // fixed-association rational chain (no ln) → oracle-checked BITWISE;
    // the log-space ppl roll-up stays spec-gated (LanguageModelSpec).
    "q_lm_kn" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val train = d.filter(col("doc_id") < 250)
      val uni = LanguageModel.unigramCounts(train, "text")
      val bi = LanguageModel.bigramCounts(train, "text")
      LanguageModel.knProbStream(
        d.filter(col("doc_id") >= 250 && col("doc_id") < 260),
        "doc_id", "text", uni, bi)
        .select(col("doc").as("doc_id"), col("pos"), col("w1"), col("w2"),
          asLong(col("c12")).as("c12"), asLong(col("c1")).as("c1"),
          asLong(col("ctot")).as("ctot"),
          asLong(col("n_succ")).as("n_succ"),
          asLong(col("n_pred")).as("n_pred"), col("p"))
        .orderBy("doc_id", "pos")
    }),

    // NB quality classifier, engine-exact face: class counts trained on
    // doc_id < 250 (positive = English), integer evidence + one-division
    // share for the rest; the log-odds score is spec-gated.
    "q_quality_nb" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val counts = QualityClassifier.classCounts(
        d.filter(col("doc_id") < 250).withColumn("y", col("lang") === "en"),
        "text", "y")
      QualityClassifier.nbEvidence(d.filter(col("doc_id") >= 250), "doc_id",
        "text", counts)
        .orderBy("doc_id")
    }),

    // engine-exact logistic evidence: the FIRST full-batch gradient step
    // from zero init is pure integer arithmetic (residual ±1/2 folds into
    // the emitted unscaled margin), so the whole hashing/gradient/score
    // plumbing oracle-checks bitwise under the md5 feature id; the
    // multi-epoch float weights stay spec-gated + golden-pinned below.
    "q_logistic_evidence" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val dim = 1 << 12
      QualityClassifier.logisticEvidence(
        d.filter(col("doc_id") < 250).withColumn("y", col("lang") === "en"),
        d.filter(col("doc_id") >= 250),
        "doc_id", "text", "y", dim,
        fidOf = Some(QualityClassifier.md5FeatureId(dim)))
        .orderBy("doc_id")
    }),

    // hashed-feature logistic regression (the fastText-style filter):
    // bitwise-deterministic decimal-summed training (spec-pinned), so the
    // scored output golden-pins; no SQL oracle can express the training
    // loop.
    "q_quality_logistic" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val model = QualityClassifier.trainLogistic(
        d.filter(col("doc_id") < 250).withColumn("y", col("lang") === "en"),
        "doc_id", "text", "y", dim = 1 << 12, epochs = 6, lr = 0.5)
      QualityClassifier.scoreLogistic(d.filter(col("doc_id") >= 250),
        "doc_id", "text", model)
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // same 60-bit md5 bucket construction as q_split_assign's oracle.
    "q_sample_mixture" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))::BIGINT
        |      % 1000000 AS b
        |  FROM documents)
        |WHERE (lang = 'en' AND b < 1000000)
        |   OR (lang = 'de' AND b < 500000)
        |   OR (lang = 'es' AND b < 500000)
        |   OR (lang = 'fr' AND b < 250000)
        |   OR (lang = 'zh' AND b < 100000)
        |ORDER BY doc_id""".stripMargin,

    // position-preserving trigram CTE (NO list_distinct — spans count
    // once per occurrence), duplicated = seen in >= 2 distinct docs.
    "q_dup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM toks),
        |dup AS (SELECT s, TRUE AS d FROM (
        |    SELECT s, count(DISTINCT doc_id) AS nd FROM sh GROUP BY s)
        |  WHERE nd > 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(SUM(CASE WHEN d THEN 1 ELSE 0 END), 0) AS BIGINT)
        |    AS n_dup_grams,
        |  CAST(COALESCE(SUM(CASE WHEN d THEN 1 ELSE 0 END), 0) AS DOUBLE)
        |    / count(*) AS dup_frac
        |FROM sh LEFT JOIN dup USING (s)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_bloom_join" ->
      """SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 150000
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_lm_counts" ->
      """WITH toks AS (SELECT list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '') AS w
        |  FROM documents),
        |bg AS (SELECT unnest(list_transform(range(1, greatest(len(w), 1)),
        |    i -> w[i] || ' ' || w[i+1])) AS bigram
        |  FROM toks)
        |SELECT bigram, CAST(count(*) AS BIGINT) AS c
        |FROM bg GROUP BY bigram
        |ORDER BY c DESC, bigram LIMIT 50""".stripMargin,

    "q_lm_score" ->
      """WITH tr AS (SELECT list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '') AS w
        |  FROM documents WHERE doc_id < 250),
        |sc AS (SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '') AS w
        |  FROM documents WHERE doc_id >= 250),
        |unic AS (SELECT token, count(*) AS cu FROM (
        |    SELECT unnest(w) AS token FROM tr) GROUP BY 1),
        |bic AS (SELECT g, count(*) AS cb FROM (
        |    SELECT unnest(list_transform(range(1, greatest(len(w), 1)),
        |      i -> w[i] || ' ' || w[i+1])) AS g FROM tr) GROUP BY 1),
        |tstats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CASE WHEN cu IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS oov_tokens
        |  FROM (SELECT doc_id, unnest(w) AS token FROM sc)
        |  LEFT JOIN unic USING (token) GROUP BY doc_id),
        |bstats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(CASE WHEN cb IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |      AS hit_bigrams
        |  FROM (SELECT doc_id, unnest(list_transform(
        |      range(1, greatest(len(w), 1)), i -> w[i] || ' ' || w[i+1])) AS g
        |    FROM sc)
        |  LEFT JOIN bic USING (g) GROUP BY doc_id)
        |SELECT doc_id, n_tokens, oov_tokens,
        |  CAST(oov_tokens AS DOUBLE) / n_tokens AS oov_rate,
        |  CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(COALESCE(hit_bigrams, 0) AS BIGINT) AS hit_bigrams,
        |  CASE WHEN n_bigrams > 0
        |    THEN CAST(hit_bigrams AS DOUBLE) / n_bigrams END
        |    AS bigram_hit_rate
        |FROM tstats LEFT JOIN bstats USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // expression chain mirrors LanguageModel.knProbStream node for node
    // (greatest over coalesced c12, left-assoc d·n_succ/ctot·pcont — the
    // denominator is the CONTEXT TOTAL sum_w2 c(w1 w2), not the unigram
    // count) for bitwise double parity, the pmi_ratio/bm25 pattern.
    "q_lm_kn" ->
      """WITH tr AS (SELECT list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '') AS w
        |  FROM documents WHERE doc_id < 250),
        |uni AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(w) AS token FROM tr) GROUP BY 1),
        |bi AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(list_transform(range(1, greatest(len(w), 1)),
        |      i -> w[i] || ' ' || w[i+1])) AS g FROM tr) GROUP BY 1),
        |scal AS (SELECT (SELECT count(*) FROM bi) AS b,
        |    (SELECT count(*) FROM uni) AS v),
        |nsucc AS (SELECT string_split(g, ' ')[1] AS w1,
        |    CAST(count(*) AS BIGINT) AS n_succ,
        |    CAST(sum(c) AS BIGINT) AS ctot FROM bi GROUP BY 1),
        |npred AS (SELECT string_split(g, ' ')[2] AS w2,
        |    CAST(count(*) AS BIGINT) AS n_pred FROM bi GROUP BY 1),
        |sc AS (SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '') AS w
        |  FROM documents WHERE doc_id >= 250 AND doc_id < 260),
        |st AS (SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(w), 1)), i -> struct_pack(pos := i - 1,
        |      g := w[i] || ' ' || w[i+1]))) AS s FROM sc),
        |flat AS (SELECT doc_id, s.pos AS pos, s.g AS bigram,
        |    string_split(s.g, ' ')[1] AS w1, string_split(s.g, ' ')[2] AS w2
        |  FROM st)
        |SELECT f.doc_id, CAST(f.pos AS BIGINT) AS pos, f.w1, f.w2,
        |  CAST(COALESCE(b2.c, 0) AS BIGINT) AS c12,
        |  CAST(COALESCE(u.c, 0) AS BIGINT) AS c1,
        |  CAST(COALESCE(ns.ctot, 0) AS BIGINT) AS ctot,
        |  CAST(COALESCE(ns.n_succ, 0) AS BIGINT) AS n_succ,
        |  CAST(COALESCE(np.n_pred, 0) AS BIGINT) AS n_pred,
        |  CASE WHEN ns.n_succ IS NOT NULL THEN
        |    greatest(CAST(COALESCE(b2.c, 0) AS DOUBLE) - 0.75, 0.0)
        |        / CAST(ns.ctot AS DOUBLE)
        |      + 0.75 * CAST(ns.n_succ AS DOUBLE) / CAST(ns.ctot AS DOUBLE)
        |        * ((CAST(COALESCE(np.n_pred, 0) AS DOUBLE) + 1.0)
        |          / CAST(s.b + s.v AS DOUBLE))
        |  ELSE (CAST(COALESCE(np.n_pred, 0) AS DOUBLE) + 1.0)
        |    / CAST(s.b + s.v AS DOUBLE) END AS p
        |FROM flat f
        |LEFT JOIN bi b2 ON f.bigram = b2.g
        |LEFT JOIN uni u ON f.w1 = u.token
        |LEFT JOIN nsucc ns ON f.w1 = ns.w1
        |LEFT JOIN npred np ON f.w2 = np.w2, scal s
        |ORDER BY doc_id, pos""".stripMargin,

    // mirrors QualityClassifier.logisticEvidence under md5FeatureId:
    // gram stream = unigrams ++ bigrams, fid = 52-bit md5 bucket % 4096,
    // integer gradient per fid from the labeled slice, per-doc exact
    // BIGINT margin for the rest.
    "q_logistic_evidence" ->
      """WITH tr AS (SELECT doc_id, (lang = 'en') AS y, list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '') AS w
        |  FROM documents WHERE doc_id < 250),
        |trg AS (SELECT y, unnest(w) AS g FROM tr
        |  UNION ALL
        |  SELECT y, unnest(list_transform(range(1, greatest(len(w), 1)),
        |    i -> w[i] || ' ' || w[i+1])) AS g FROM tr),
        |grad AS (SELECT ('0x' || substr(md5(g), 20, 13))::BIGINT % 4096
        |    AS fid, CAST(sum(CASE WHEN y THEN 1 ELSE -1 END) AS BIGINT)
        |    AS gv
        |  FROM trg GROUP BY 1),
        |sc AS (SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '') AS w
        |  FROM documents WHERE doc_id >= 250),
        |scg AS (SELECT doc_id, unnest(w) AS g FROM sc
        |  UNION ALL
        |  SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(w), 1)),
        |    i -> w[i] || ' ' || w[i+1])) AS g FROM sc),
        |feats AS (SELECT doc_id,
        |    ('0x' || substr(md5(g), 20, 13))::BIGINT % 4096 AS fid,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM scg GROUP BY doc_id, fid),
        |ev AS (SELECT f.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_features,
        |    CAST(sum(f.cnt) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN gr.gv IS NULL THEN f.cnt ELSE 0 END)
        |      AS BIGINT) AS oov_grams,
        |    CAST(COALESCE(sum(gr.gv * f.cnt), 0) AS BIGINT) AS grad_margin
        |  FROM feats f LEFT JOIN grad gr USING (fid) GROUP BY f.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(e.n_features, 0) AS n_features,
        |  COALESCE(e.n_grams, 0) AS n_grams,
        |  COALESCE(e.oov_grams, 0) AS oov_grams,
        |  COALESCE(e.grad_margin, 0) AS grad_margin,
        |  COALESCE(e.grad_margin, 0) > 0 AS predicted_pos
        |FROM documents d LEFT JOIN ev e USING (doc_id)
        |WHERE d.doc_id >= 250
        |ORDER BY d.doc_id""".stripMargin,

    "q_quality_nb" ->
      """WITH tr AS (SELECT (lang = 'en') AS y, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '')) AS token
        |  FROM documents WHERE doc_id < 250),
        |counts AS (SELECT token,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
        |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
        |  FROM tr GROUP BY token),
        |st AS (SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '')) AS token
        |  FROM documents WHERE doc_id >= 250),
        |ev AS (SELECT s.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN c.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS oov_tokens,
        |    CAST(COALESCE(sum(c.c_pos), 0) AS BIGINT) AS pos_evidence,
        |    CAST(COALESCE(sum(c.c_neg), 0) AS BIGINT) AS neg_evidence
        |  FROM st s LEFT JOIN counts c USING (token) GROUP BY s.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(e.n_tokens, 0) AS n_tokens,
        |  COALESCE(e.oov_tokens, 0) AS oov_tokens,
        |  COALESCE(e.pos_evidence, 0) AS pos_evidence,
        |  COALESCE(e.neg_evidence, 0) AS neg_evidence,
        |  CASE WHEN COALESCE(e.pos_evidence, 0) + COALESCE(e.neg_evidence, 0) > 0
        |    THEN CAST(e.pos_evidence AS DOUBLE)
        |      / CAST(e.pos_evidence + e.neg_evidence AS DOUBLE) END AS pos_share
        |FROM documents d LEFT JOIN ev e USING (doc_id)
        |WHERE d.doc_id >= 250
        |ORDER BY d.doc_id""".stripMargin
  )
}
