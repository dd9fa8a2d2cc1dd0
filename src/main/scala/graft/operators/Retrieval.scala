package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Keyword retrieval over the corpus — the data-selection / targeted-
  * decontamination face of the training-data tier (find the documents
  * most relevant to a benchmark prompt or a domain seed list).
  *
  * BM25 (Robertson et al., the Lucene-default `+1` idf variant so idf
  * stays positive even for terms in >half the corpus):
  *
  *   score(d) = Σ_t ln((N − df_t + 0.5)/(df_t + 0.5) + 1) ·
  *              tf · (k1 + 1) / (tf + k1 · (1 − b + b · dl/avgdl))
  *
  * Two shapes:
  *   - [[bm25]] scans the corpus once per query batch (ad-hoc);
  *   - [[writeBm25Index]] + [[bm25FromIndex]] materialize the inverted
  *     index ONCE — postings partitioned by a term-hash bucket so a
  *     query's terms prune the scan to their buckets (static partition
  *     filter, like the LSH/MinHash indexes), doc lengths and the
  *     (N, Σdl) corpus stats stored beside them. At 100 TB this is the
  *     production shape: query cost is proportional to the matched
  *     postings, never the corpus.
  *
  * The per-doc score sums term contributions in ascending-term order via
  * a sorted-array fold, so the double result is deterministic and
  * bitwise-reproducible across partitionings (and against the oracle);
  * both shapes share one scoring routine, so index-served scores are
  * bitwise-identical to the ad-hoc ones.
  */
object Retrieval {

  private def tokenize(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("doc"),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= lit(""))).as("token"))

  /** idf = ln(((N - df) + 0.5) / (df + 0.5) + 1) — the oracle carries the
    * same expression tree node for node so the doubles agree bitwise.
    */
  private def scoreAndTop(td: DataFrame, dl: DataFrame, n: Long,
      avgdl: Double, k1: Double, b: Double, topN: Int,
      idCol: String): DataFrame = {
    val dfreq = td.groupBy(col("token")).agg(count(lit(1)).as("dfr"))
    val contrib = td
      .join(broadcast(dfreq.withColumn("idf",
        log(((lit(n) - col("dfr")).cast(DoubleType) + lit(0.5)) /
          (col("dfr").cast(DoubleType) + lit(0.5)) + lit(1.0)))),
        Seq("token"))
      .join(dl, Seq("doc"))
      .withColumn("c",
        col("idf") * (col("tf").cast(DoubleType) * lit(k1 + 1.0)) /
          (col("tf").cast(DoubleType) +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast(DoubleType) / lit(avgdl))))
    contrib.groupBy(col("doc"))
      .agg(
        aggregate(sort_array(collect_list(struct(col("token"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("score"),
        count(lit(1)).as("n_terms"))
      .select(col("doc").as(idCol), col("n_terms"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topN)
  }

  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topN: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tok = tokenize(df, idCol, textCol)
    val dl = tok.groupBy(col("doc")).agg(count(lit(1)).as("dl"))
    val n = df.agg(count(lit(1))).collect().head.getLong(0)
    val sumDl = dl.agg(coalesce(sum(col("dl")), lit(0L))).collect().head.getLong(0)
    val td = tok.filter(col("token").isin(queryTerms: _*))
      .groupBy(col("doc"), col("token")).agg(count(lit(1)).as("tf"))
    scoreAndTop(td, dl, n, sumDl.toDouble / n, k1, b, topN, idCol)
  }

  /** Batch BM25 — score EVERY query of a query TABLE in one inverted-index
    * pass (the serving shape at scale: corpus tokenized once, per-term
    * df/idf computed once globally, queries equi-join the postings on
    * token — never a per-query loop or driver-side collect). `queries` is
    * `(queryIdCol, termsCol: array<string>)`; output is
    * `(query_id, doc_id-named idCol, rank, score)` with `rank` 1-based per
    * query over (score desc, id). The idf and per-term contribution
    * expression trees are node-for-node the single-query [[bm25]] ones, so
    * scores stay bitwise-reproducible against the DuckDB oracle — which is
    * what makes the RANKS (all downstream fusion consumes) exact.
    */
  def bm25Batch(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termsCol: String,
      k1: Double = 1.2, b: Double = 0.75, topN: Int = 20): DataFrame = {
    val tok = tokenize(df, idCol, textCol)
    val dl = tok.groupBy(col("doc")).agg(count(lit(1)).as("dl"))
    val n = df.agg(count(lit(1))).collect().head.getLong(0)
    val sumDl = dl.agg(coalesce(sum(col("dl")), lit(0L))).collect().head.getLong(0)
    val td = tok.groupBy(col("doc"), col("token")).agg(count(lit(1)).as("tf"))
    scoreBatch(queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(col(termsCol))).as("token")),
      td, dl, n, sumDl.toDouble / n, k1, b, topN, idCol)
  }

  /** Shared batch-scoring core: postings pruned to the query vocabulary
    * (semi-join — df/idf never aggregates the full vocab), idf broadcast,
    * per-(query, doc) ordered fold, rank per query.
    */
  private def scoreBatch(qt: DataFrame, td: DataFrame, dl: DataFrame,
      n: Long, avgdl: Double, k1: Double, b: Double, topN: Int,
      idCol: String): DataFrame = {
    val tdq = td.join(qt.select(col("token")).distinct(), Seq("token"),
      "left_semi")
    val dfreq = tdq.groupBy(col("token")).agg(count(lit(1)).as("dfr"))
    val contrib = qt
      .join(tdq, Seq("token"))
      .join(broadcast(dfreq.withColumn("idf",
        log(((lit(n) - col("dfr")).cast(DoubleType) + lit(0.5)) /
          (col("dfr").cast(DoubleType) + lit(0.5)) + lit(1.0)))),
        Seq("token"))
      .join(dl, Seq("doc"))
      .withColumn("c",
        col("idf") * (col("tf").cast(DoubleType) * lit(k1 + 1.0)) /
          (col("tf").cast(DoubleType) +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast(DoubleType) / lit(avgdl))))
    contrib.groupBy(col("query_id"), col("doc"))
      .agg(
        aggregate(sort_array(collect_list(struct(col("token"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("score"),
        count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc"))))
      .filter(col("rank") <= topN)
      .select(col("query_id"), col("doc").as(idCol), col("rank"),
        col("n_terms"), col("score"))
  }

  /** [[bm25Batch]] served from a materialized [[writeBm25Index]] index —
    * the sparse arm of an index-served hybrid stack: the postings scan
    * carries a STATIC partition filter on the union of the batch's query
    * terms' buckets (plus token equality within them), so it reads at
    * most `|distinct terms| / nBuckets` of the index and never the
    * corpus. Scores are bitwise-identical to [[bm25Batch]] on the same
    * corpus (same expression trees; spec-pinned).
    *
    * CONTRACT (the served-path recipe shared with the ANN indexes): the
    * distinct term set collects driver-side to build the static prune,
    * so it is capped at `maxQueryTerms` — corpus-sized query batches
    * should use [[bm25Batch]] against a direct postings read instead.
    */
  def bm25BatchFromIndex(spark: SparkSession, path: String,
      queries: DataFrame, queryIdCol: String, termsCol: String,
      k1: Double = 1.2, b: Double = 0.75, topN: Int = 20,
      idCol: String = "doc_id", maxQueryTerms: Int = 65536): DataFrame = {
    val qt = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(col(termsCol))).as("token"))
    val terms = qt.select(col("token")).distinct()
      .limit(maxQueryTerms + 1).collect().map(_.getString(0))
    require(terms.length <= maxQueryTerms,
      s"bm25BatchFromIndex serves at most $maxQueryTerms distinct query " +
        "terms per call (driver collects the term set for static " +
        "partition pruning); for corpus-sized query batches use bm25Batch " +
        "against a direct postings read")
    val (n, avgdl, nBuckets) = readBm25Stats(spark, path)
    val td = spark.read.parquet(s"$path/postings")
      .filter(col("tb").isin(
        terms.map(t => termBucketValue(t, nBuckets)).distinct.toSeq: _*) &&
        col("token").isin(terms.toSeq: _*))
      .select(col("doc"), col("token"), col("tf"))
    val dl = spark.read.parquet(s"$path/doclen")
    scoreBatch(qt, td, dl, n, avgdl, k1, b, topN, idCol)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid-
    * retrieval merge: `score(q, d) = Σ_arms 1 / (kRrf + rank(q, d))` over
    * however many ranked arms participate (sparse BM25, dense ANN, …).
    * Arm-agnostic: each arm is `(query_id, doc_id, rank)` with 1-based
    * ranks per query. The per-pair sum folds arms in ascending arm-index
    * order (the [[bm25]] sorted-array-fold pattern), so the double is
    * deterministic under any partitioning — and since it consumes only
    * integer RANKS, the fusion is exactly reproducible in any engine even
    * when the arms' raw scores are float-fragile. One shuffle on
    * (query_id, doc_id); arms never materialize driver-side.
    */
  def rrfFuse(arms: Seq[DataFrame], kRrf: Int = 60,
      topN: Int = 10): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one arm")
    val tagged = arms.zipWithIndex.map { case (a, i) =>
      a.select(col("query_id"), col("doc_id"),
        col("rank").cast(LongType).as("rank"), lit(i).as("arm"))
    }
    tagged.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        aggregate(sort_array(collect_list(struct(col("arm"), col("rank")))),
          lit(0.0), (acc, x) => acc + lit(1.0) /
            (lit(kRrf).cast(DoubleType) + x.getField("rank").cast(DoubleType)))
          .as("rrf"),
        count(lit(1)).as("n_arms"))
      .withColumn("fused_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("fused_rank") <= topN)
  }

  /** Term-hash partition key: `nBuckets` directories regardless of
    * vocabulary size (partitioning directly by token would mint one
    * directory per distinct term).
    */
  private def termBucket(token: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(token), lit(nBuckets.toLong))

  /** Materialize the inverted index at `path`:
    * `postings/` (token, doc, tf) partitioned by `tb` (term bucket),
    * `doclen/` (doc, dl), `stats/` one row (n, sum_dl).
    */
  def writeBm25Index(df: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    val tok = tokenize(df, idCol, textCol)
    tok.groupBy(col("doc"), col("token")).agg(count(lit(1)).as("tf"))
      .withColumn("tb", termBucket(col("token"), nBuckets))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$path/postings")
    tok.groupBy(col("doc")).agg(count(lit(1)).as("dl"))
      .write.mode("overwrite").parquet(s"$path/doclen")
    val n = df.agg(count(lit(1))).collect().head.getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    val sumDl = tok.agg(count(lit(1))).collect().head.getLong(0)
    // n_buckets is part of the index layout: persisted so serve paths
    // derive the SAME bucketing they prune on (a mismatched bucket count
    // would silently prune the wrong partitions)
    Seq((n, sumDl, nBuckets.toLong)).toDF("n", "sum_dl", "n_buckets")
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 over a pre-built [[writeBm25Index]] index: the postings scan
    * carries a STATIC partition filter on the query terms' buckets (plus
    * the token equality within them), so it reads `|terms|/nBuckets` of
    * the index, never the corpus. Scores are bitwise-identical to
    * [[bm25]] on the same corpus.
    */
  def bm25FromIndex(spark: SparkSession, path: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topN: Int = 20, idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val (n, avgdl, nBuckets) = readBm25Stats(spark, path)
    val td = spark.read.parquet(s"$path/postings")
      .filter(col("tb").isin(
        queryTerms.map(t => termBucketValue(t, nBuckets)): _*) &&
        col("token").isin(queryTerms: _*))
      .select(col("doc"), col("token"), col("tf"))
    val dl = spark.read.parquet(s"$path/doclen")
    scoreAndTop(td, dl, n, avgdl, k1, b, topN, idCol)
  }

  /** `(n, avgdl, n_buckets)` from a [[writeBm25Index]] stats file. The
    * bucket count comes from the INDEX, never a caller parameter — the
    * prune must use the write-time bucketing.
    */
  private def readBm25Stats(spark: SparkSession,
      path: String): (Long, Double, Int) = {
    val stats = spark.read.parquet(s"$path/stats").collect().head
    val n = stats.getLong(0)
    (n, stats.getLong(1).toDouble / n, stats.getLong(2).toInt)
  }

  /** Driver-side mirror of [[termBucket]] (Spark's xxhash64 with seed 42). */
  /** Exact phrase search over whitespace tokens: docs containing the
    * phrase's tokens consecutively, with occurrence counts and the first
    * 0-based start position.
    *
    * Shape: no k-way positional self-join. Each posting matching the
    * phrase's term `i` votes for candidate start `pos - i`; a start with
    * all k votes is an occurrence (a posting contributes at most one row
    * per (start, i), so `count == k` ⟺ every slot matched — correct even
    * when the phrase repeats a term, and overlapping occurrences count
    * separately). The token stream is pruned to the phrase's terms
    * BEFORE the one (doc, start) shuffle, so the exchange is bounded by
    * the terms' corpus frequency, not corpus size. (A positional-index
    * variant would persist (term, doc, pos) partitioned by term bucket
    * like [[writeBm25Index]]; the scan form here is the ad-hoc path.)
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val terms = splitPhrase(phrase)
    val postings = df.select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(terms.distinct: _*))
    phraseMatch(postings, terms, idCol)
  }

  /** Materialize the positional index at `path`: `positions/`
    * (doc, pos, tok) partitioned by term-hash bucket — the persistent
    * form phrase/proximity queries prune to their terms' buckets, like
    * [[writeBm25Index]]'s postings. Tokenization is the whitespace model
    * of [[phraseSearch]] (NOT the lowercased letter-run model of BM25),
    * so served results are identical to the ad-hoc path.
    */
  def writePositionalIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    df.select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("tb", termBucket(col("tok"), nBuckets))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$path/positions")
    val spark = df.sparkSession
    import spark.implicits._
    // bucket count is part of the layout — persisted like the BM25 stats
    Seq(nBuckets.toLong).toDF("n_buckets")
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** [[phraseSearch]] over a pre-built [[writePositionalIndex]]: same
    * start-marker voting, but the scan carries a STATIC partition filter
    * on the phrase terms' buckets — it reads ≤ |terms|/nBuckets of the
    * index and never the corpus. Row-identical to the ad-hoc path. The
    * bucket count comes from the index's stats file, never a caller
    * parameter (a mismatch would silently prune the wrong partitions).
    */
  def phraseFromIndex(spark: SparkSession, path: String, phrase: String,
      idCol: String = "doc_id"): DataFrame = {
    val terms = splitPhrase(phrase)
    val nBuckets = spark.read.parquet(s"$path/stats")
      .collect().head.getLong(0).toInt
    val postings = spark.read.parquet(s"$path/positions")
      .filter(col("tb").isin(
        terms.distinct.map(t => termBucketValue(t, nBuckets)): _*) &&
        col("tok").isin(terms.distinct: _*))
      .select(col("doc"), col("pos"), col("tok"))
    phraseMatch(postings, terms, idCol)
  }

  private def splitPhrase(phrase: String): Seq[String] = {
    val terms = phrase.split(" ").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "phrase must contain at least one token")
    terms
  }

  /** The voting pipeline shared by the scan and index paths: postings
    * are (doc, pos, tok) already restricted to the phrase's terms.
    */
  private def phraseMatch(postings: DataFrame, terms: Seq[String],
      idCol: String): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val k = terms.length
    val termsDf = terms.zipWithIndex.toDF("tok", "i")
    postings
      .join(broadcast(termsDf), Seq("tok"))
      .select(col("doc"), (col("pos") - col("i")).as("start"))
      .filter(col("start") >= 0)
      .groupBy("doc", "start")
      .agg(count(lit(1)).as("nmatch"))
      .filter(col("nmatch") === k)
      .groupBy("doc")
      .agg(count(lit(1)).cast(LongType).as("n_occurrences"),
        min(col("start")).cast(LongType).as("first_pos"))
      .select(col("doc").as(idCol), col("n_occurrences"), col("first_pos"))
  }

  private def termBucketValue(token: String, nBuckets: Int): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(token),
      org.apache.spark.sql.types.StringType, 42L)
    val m = h % nBuckets
    if (m < 0) m + nBuckets else m
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    * 1998) over an embedding corpus: per query, greedily pick `kOut`
    * results trading relevance against redundancy —
    * `score(d) = λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)` — the
    * near-dup-aware retrieval every RAG/curation pipeline wants when
    * plain top-k returns five copies of the same boilerplate.
    *
    * Scale shape: ONE brute-force (or ANN-substitutable) top-`kCand`
    * pass bounds the working set to `|Q|·kCand` rows; the candidate
    * pairwise-sim table is `|Q|·kCand²` (both localCheckpointed once,
    * reused every round). Each greedy round is then 2 hash joins + one
    * per-query window over that bounded table — `kOut−1` rounds, no
    * driver data movement. All per-query work is partition-local after
    * the first shuffle on query_id.
    *
    * Determinism + oracle parity: sims are the index-order fold of
    * [[graft.functions.VectorFunctions.dot]] (bitwise equal to any
    * engine's sequential sum); `lambda` must be an exactly-representable
    * double (default 0.5) so `λ·rel − (1−λ)·mx` is two roundings in a
    * fixed order; max over the selected set is order-free; ties break
    * (score desc, neighbor_id asc). Round 1 scores pure relevance.
    *
    * Output: `(query_id, neighbor_id, mmr_rank, score)`.
    */
  def mmrDiversify(queries: DataFrame, corpus: DataFrame, kCand: Int,
      kOut: Int, lambda: Double = 0.5): DataFrame = {
    require(kOut >= 1 && kOut <= kCand,
      s"need 1 <= kOut <= kCand, got kOut=$kOut kCand=$kCand")
    require(kCand <= 1000, s"kCand above 1000 (got $kCand) makes the " +
      "pairwise table the bottleneck — shrink the candidate pool")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    import graft.functions.VectorFunctions.{dot, l2Norm}
    val w = org.apache.spark.sql.expressions.Window
    val cand = Similarity.bruteForceTopK(queries, corpus, kCand)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("rel"))
      .localCheckpoint(true)
    val vecs = corpus.select(col("id").as("neighbor_id"),
      col("embedding"), l2Norm(col("embedding")).as("nrm"))
    val cv = cand.join(vecs, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("embedding"),
        col("nrm"))
    val pairs = cv.select(col("query_id"), col("neighbor_id").as("cand_id"),
        col("embedding").as("e_a"), col("nrm").as("n_a"))
      .join(cv.select(col("query_id"), col("neighbor_id").as("other_id"),
        col("embedding").as("e_b"), col("nrm").as("n_b")), Seq("query_id"))
      .filter(col("cand_id") =!= col("other_id"))
      .select(col("query_id"), col("cand_id"), col("other_id"),
        (dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")))
          .as("psim"))
      .localCheckpoint(true)
    def pick(scored: DataFrame, rank: Int): DataFrame = scored
      .withColumn("rn", row_number().over(w.partitionBy("query_id")
        .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("neighbor_id"),
        lit(rank.toLong).as("mmr_rank"), col("score"))
    var selected = pick(cand.withColumn("score", col("rel")), 1)
      .localCheckpoint(true)
    var r = 2
    while (r <= kOut) {
      val remaining = cand.join(
        selected.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
      val mx = pairs.join(
          selected.select(col("query_id"),
            col("neighbor_id").as("other_id")),
          Seq("query_id", "other_id"))
        .groupBy(col("query_id"), col("cand_id").as("neighbor_id"))
        .agg(max(col("psim")).as("mx"))
      val scored = remaining.join(mx, Seq("query_id", "neighbor_id"))
        .withColumn("score",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("mx"))
      selected = selected.unionByName(pick(scored, r)).localCheckpoint(true)
      r += 1
    }
    selected
  }

  /** Truncated rank-biased overlap (Webber et al. 2010) between two
    * top-k rankings — the rank-SENSITIVE agreement measure beside
    * [[evalTopK]]'s set metrics: two lists that agree at the top score
    * near 1 even if their tails diverge,
    * {{{
    *   RBO@k = (1−p) · Σ_{d=1..k} p^{d−1} · |A_{1..d} ∩ B_{1..d}| / d
    * }}}
    * (no extrapolation term — the truncated form, so two identical
    * lists score (1−p)·Σ p^{d−1} < 1 by design). A common item enters
    * the overlap at depth max(rank_a, rank_b), so the depth profile is
    * one `sequence(m, k)` explode over the |Q|·k-bounded common table —
    * never a per-depth self-join. The d-ordered fold keeps the double
    * deterministic; quantize to ppb at the gate (`pow` is libm
    * territory). `1−p` is computed as a double SUBTRACTION on both
    * engines so the weight matches bit-for-bit.
    *
    * Output: `(query_id, n_common, rbo)`, one row per query in `runA`.
    */
  def rankBiasedOverlap(runA: DataFrame, runB: DataFrame, k: Int,
      p: Double = 0.9): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"p must be in (0,1), got $p")
    val a = runA.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast(LongType).as("ra"))
    val b = runB.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast(LongType).as("rb"))
    val common = a.join(b, Seq("query_id", "neighbor_id"))
      .select(col("query_id"), greatest(col("ra"), col("rb")).as("m"))
    val contrib = common
      .withColumn("d", explode(sequence(col("m"), lit(k.toLong))))
      .groupBy(col("query_id"), col("d"))
      .agg(count(lit(1)).as("x"))
    val grid = a.select(col("query_id")).distinct()
      .withColumn("d", explode(sequence(lit(1L), lit(k.toLong))))
      .join(contrib, Seq("query_id", "d"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    grid
      .withColumn("term",
        pow(lit(p), col("d") - lit(1L)) * col("x") / col("d"))
      .groupBy(col("query_id"))
      .agg(max(col("x")).as("n_common"),
        aggregate(
          sort_array(collect_list(struct(col("d"), col("term")))),
          lit(0.0), (acc, t) => acc + t.getField("term")).as("__s"))
      .select(col("query_id"), col("n_common"),
        ((lit(1.0) - lit(p)) * col("__s")).as("rbo"))
  }

  /** Retrieval-quality scorecard: per query, recall@k, MRR, and nDCG@k
    * of a system `run` against a ground-truth `truth` ranking — the
    * harness that turns every ANN family here into a measurable
    * quality/latency trade-off (truth is usually
    * [[Similarity.bruteForceTopK]]; run is an IVF/PQ/LSH serving path).
    *
    * Both inputs carry `(query_id, neighbor_id, rank)`; rows with
    * `rank > k` are ignored, so full top-N tables can be passed as-is.
    * Binary relevance: a run row is relevant iff its neighbor appears
    * in the query's truth top-k.
    *
    * Determinism contract (driver hash-compare): recall and MRR are
    * single exact IEEE divisions of small integers; the nDCG fold sums
    * `1/log2(rank+1)` in ascending-rank order on both engines, and the
    * caller should quantize `ndcg` to ppb (engine `log2` can differ by
    * 1 ulp — the q_drift_psi finding). One shuffle per aggregation,
    * grouped by query — cost ∝ |queries|·k, never the corpus.
    *
    * Output: `(query_id, n_truth, n_run, n_hits, recall, mrr, ndcg)`,
    * one row per query present in `truth`; a query missing from `run`
    * scores zeros.
    */
  def evalTopK(truth: DataFrame, run: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tK = truth.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val rK = run.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast(LongType).as("rank"))
    val marked = rK.join(tK.withColumn("rel", lit(1)),
      Seq("query_id", "neighbor_id"), "left")
    val perRun = marked.groupBy(col("query_id")).agg(
      count(lit(1)).as("n_run"),
      sum(coalesce(col("rel"), lit(0))).cast(LongType).as("n_hits"),
      min(when(col("rel") === 1, col("rank"))).as("fhr"),
      sort_array(collect_list(when(col("rel") === 1, col("rank"))))
        .as("hit_ranks"))
      .withColumn("dcg", expr(
        "aggregate(hit_ranks, CAST(0.0 AS DOUBLE), " +
          "(acc, r) -> acc + CAST(1.0 AS DOUBLE) / log2(CAST(r AS DOUBLE) + 1.0))"))
    val perTruth = tK.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_truth"))
    perTruth.join(perRun, Seq("query_id"), "left")
      .withColumn("idcg", expr(
        s"aggregate(sequence(1L, least(n_truth, ${k}L)), CAST(0.0 AS DOUBLE), " +
          "(acc, i) -> acc + CAST(1.0 AS DOUBLE) / log2(CAST(i AS DOUBLE) + 1.0))"))
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_run"), lit(0L)).as("n_run"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast(DoubleType) / col("n_truth"))
          .as("recall"),
        when(col("fhr").isNull, lit(0.0))
          .otherwise(lit(1.0).cast(DoubleType) / col("fhr")).as("mrr"),
        when(col("idcg") === 0.0, lit(0.0))
          .otherwise(coalesce(col("dcg"), lit(0.0)) / col("idcg"))
          .as("ndcg"))
  }
}
