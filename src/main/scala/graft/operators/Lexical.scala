package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lexical-statistics filters for pre-training corpus curation: per-doc
  * word-distribution entropy / type-token ratio (the RefinedWeb /
  * Gopher-style "natural language" gates that kill boilerplate, key
  * smash, and template spam), and the corpus-level Zipf rank-frequency
  * slope (Zipf 1949; a healthy natural-language corpus fits
  * ln f ≈ a + s·ln r with s ≈ −1, while machine-generated or
  * deduplication-damaged corpora drift off it).
  *
  * Determinism contract: every double is produced by a fixed IEEE op
  * sequence — per-key terms folded in a total key order (word asc /
  * rank asc), single divisions at the edge — so a DuckDB replay of the
  * same arithmetic is bit-identical before the caller's ppb
  * quantization (the [[graft.queries.Q.ppb]] rule; `ln` may differ by
  * 1 ulp between JVM and libm, which ppb absorbs).
  */
object Lexical {

  /** Per-document lexical profile over whitespace words:
    * `(id, n_tokens, n_types, max_freq, sum_clnc, entropy)` where
    * `entropy = ln N − (Σ c·ln c)/N` is the Shannon entropy (nats) of
    * the doc's word distribution, `max_freq` the modal word count (the
    * Gopher repetition gate's numerator), and `sum_clnc` the raw fold
    * for oracle replay.
    *
    * 100 TB shape: explode → two key-local aggregations — the
    * (id, word) count shuffle then the per-id reduce; no window, no
    * driver state, and the per-doc fold buffer is bounded by the doc's
    * type count. The Σ c·ln c fold runs in word-ascending order via
    * `sort_array(collect_list(struct(word, term)))`, giving every
    * engine the same addition order.
    *
    * Granularity caveat: `idCol` may be any grouping (the corpus-card
    * face passes `source`), but then the fold buffer is the GROUP's
    * vocabulary — fine up to ~10⁷ types (Heaps-law vocab of a multi-TB
    * source); past that, shard the fold into word-hash-bucket sub-sums
    * folded in bucket order, and re-derive the oracle with the same
    * nesting (a different addition order is a different double).
    */
  def lexicalStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("__w"))
      .groupBy(col("__id"), col("__w"))
      .agg(count(lit(1)).as("c"))
    val cd = col("c").cast(DoubleType)
    counts
      .groupBy(col("__id").as(idCol))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        max(col("c")).as("max_freq"),
        aggregate(
          sort_array(collect_list(struct(col("__w").as("w"),
            (cd * log(cd)).as("t")))),
          lit(0.0),
          (acc, x) => acc + x("t")).as("sum_clnc"))
      .withColumn("entropy",
        log(col("n_tokens").cast(DoubleType))
          - col("sum_clnc") / col("n_tokens").cast(DoubleType))
  }

  /** Per-group bigram/conditional entropy — the predictability gate:
    * `(group, n_tokens, n_bigrams, uni_entropy, bi_entropy,
    * cond_entropy)` with `cond = H(bigram) − H(unigram)`, the
    * first-order Markov estimate of H(w₂|w₁) (Shannon 1951's n-gram
    * entropy ladder). Templated/boilerplate sources collapse toward 0;
    * natural text keeps cond ≈ 60–80 % of the unigram entropy. Bigrams
    * are intra-doc adjacent pairs with multiplicity (no cross-doc
    * pairs; single-word docs contribute none).
    *
    * Same determinism contract as [[lexicalStats]]: c·ln c terms fold
    * in gram-ascending order, one division and one subtraction at the
    * edge. Same 100 TB shape — explode + two key-local aggregations
    * per ladder rung — and the same coarse-granularity fold-buffer
    * caveat (the buffer is the group's gram vocabulary).
    */
  def bigramEntropy(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    def rung(grams: Column, nCol: String, sCol: String) = {
      val counts = df
        .select(col(groupCol).as("group"), explode(grams).as("__g"))
        .groupBy(col("group"), col("__g"))
        .agg(count(lit(1)).as("c"))
      val cd = col("c").cast(DoubleType)
      counts.groupBy(col("group"))
        .agg(sum(col("c")).as(nCol),
          aggregate(
            sort_array(collect_list(struct(col("__g").as("g"),
              (cd * log(cd)).as("t")))),
            lit(0.0), (acc, x) => acc + x("t")).as(sCol))
    }
    def entropy(nCol: String, sCol: String): Column =
      log(col(nCol).cast(DoubleType)) - col(sCol) / col(nCol).cast(DoubleType)
    rung(split(col(textCol), " "), "n_tokens", "s1")
      .join(rung(TextFunctions.wordShinglesAll(col(textCol), 2),
        "n_bigrams", "s2"), Seq("group"))
      .withColumn("uni_entropy", entropy("n_tokens", "s1"))
      .withColumn("bi_entropy", entropy("n_bigrams", "s2"))
      .withColumn("cond_entropy", col("bi_entropy") - col("uni_entropy"))
      .select(col("group"), col("n_tokens"), col("n_bigrams"),
        col("uni_entropy"), col("bi_entropy"), col("cond_entropy"))
  }

  /** The (group, word, c) count table the corpus card folds over.
    * ADDITIVE: the table of a concatenated corpus is the per-key sum of
    * the parts' tables — the property [[graft.streaming.StreamingLexical]]
    * exploits for exactly-once incremental cards.
    */
  def wordCounts(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol).as("group"),
        explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("group"), col("w"))
      .agg(count(lit(1)).as("c"))

  /** The (group, content-md5, c) duplicate ledger — additive like
    * [[wordCounts]].
    */
  def dupLedger(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol).as("group"),
        md5(to_binary(col(textCol), lit("utf-8"))).as("h"))
      .groupBy(col("group"), col("h"))
      .agg(count(lit(1)).as("c"))

  /** Per-group corpus card from (possibly multi-part) [[wordCounts]] and
    * [[dupLedger]] tables: doc/dup/token/vocab totals, integral ppm
    * ratios, and the word-distribution entropy (raw double; faces
    * quantize with `Q.ppb`). Parts merge by per-key sum first — on a
    * single-part input the re-aggregation rides the same hash
    * partitioning, no extra shuffle.
    */
  def corpusCard(wc: DataFrame, dl: DataFrame): DataFrame = {
    val mergedW = wc.groupBy(col("group"), col("w"))
      .agg(sum(col("c")).as("c"))
    val mergedD = dl.groupBy(col("group"), col("h"))
      .agg(sum(col("c")).as("c"))
    val counts = mergedD.groupBy(col("group"))
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_distinct"))
    val cd = col("c").cast(DoubleType)
    val lex = mergedW.groupBy(col("group"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        aggregate(
          sort_array(collect_list(struct(col("w"),
            (cd * log(cd)).as("t")))),
          lit(0.0), (acc, x) => acc + x("t")).as("sum_clnc"))
      .withColumn("entropy",
        log(col("n_tokens").cast(DoubleType))
          - col("sum_clnc") / col("n_tokens").cast(DoubleType))
    counts.join(lex, Seq("group"))
      .select(col("group"), col("n_docs"), col("n_distinct"),
        expr("(n_docs - n_distinct) * 1000000L div n_docs").as("dup_ppm"),
        col("n_tokens"), col("n_types"),
        expr("n_types * 1000000L div n_tokens").as("ttr_ppm"),
        expr("n_tokens div n_docs").as("tokens_per_doc"),
        col("entropy"))
  }

  /** Heaps'-law vocabulary-growth fit per group: V(N) ≈ K·N^β
    * (Heaps 1978), estimated as OLS of ln V on ln N over `points`
    * doc-id-threshold sample points — β ≈ 0.4–0.6 for natural text;
    * β near 0 means the source has stopped contributing new vocabulary
    * (template spam), near 1 means key-smash/ids. Output
    * `(group, n_points, n_tokens, n_types, beta, lnk)` with the totals
    * from the full group.
    *
    * 100 TB shape: NO windows and no per-source prefix sort — sample
    * thresholds are integer fractions of the group's max doc id, vocab
    * first-occurrence is one `min(doc_id)` per (group, word), and each
    * sample point is a threshold-conditional count over (a) the vocab
    * table and (b) the per-doc token-count table — both tiny next to
    * the corpus, crossed with only `points` thresholds. Points with
    * V = 0 or N = 0 (empty doc-id deciles) are filtered identically on
    * both engines; the four OLS sums fold in sample-point order.
    */
  def heapsLaw(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, points: Int = 10): DataFrame =
    heapsLawFromTables(wordFirstDoc(df, groupCol, idCol, textCol),
      docTokenCounts(df, groupCol, idCol, textCol), points)

  /** The (group, w, fd) first-occurrence table [[heapsLawFromTables]]
    * folds over — additive under per-key MIN (the first occurrence in
    * a concatenated corpus is the min of the parts' firsts), the
    * property [[graft.streaming.StreamingLexical]] exploits.
    */
  def wordFirstDoc(df: DataFrame, groupCol: String, idCol: String,
      textCol: String): DataFrame =
    df.select(col(groupCol).as("group"), col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("group"), col("w"))
      .agg(min(col("__id")).as("fd"))

  /** The (group, doc, t) per-doc token-count table — rows are unique
    * per doc, so multi-part tables merge by per-key sum (a replayed
    * doc overwrites its own partition in the streaming store).
    */
  def docTokenCounts(df: DataFrame, groupCol: String, idCol: String,
      textCol: String): DataFrame =
    df.select(col(groupCol).as("group"), col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("group"), col("__id"))
      .agg(count(lit(1)).as("t"))

  /** [[heapsLaw]] over prebuilt (possibly multi-part) side tables. */
  def heapsLawFromTables(fw: DataFrame, dt: DataFrame,
      points: Int = 10): DataFrame = {
    // merge parts, then checkpoint once: the tables are vocab-/doc-
    // count-sized and every sample-point join re-reads them
    val firstDoc = fw.groupBy(col("group"), col("w"))
      .agg(min(col("fd")).as("fd"))
      .localCheckpoint(true)
    val docToks = dt.groupBy(col("group"), col("__id"))
      .agg(sum(col("t")).as("t"))
      .localCheckpoint(true)
    // max doc id per group off the checkpointed table — no extra scan
    val maxId = docToks.groupBy(col("group"))
      .agg(max(col("__id")).as("mx"))
    val ks = explode(sequence(lit(1), lit(points))).as("k")
    val thresholds = maxId.select(col("group"), col("mx"), ks)
      .withColumn("thr", expr(s"mx * k div $points"))
    val v = thresholds.join(firstDoc, Seq("group"))
      .groupBy(col("group"), col("k"), col("thr"))
      .agg(sum(when(col("fd") <= col("thr"), 1L).otherwise(0L)).as("v"))
    val n = thresholds.join(docToks, Seq("group"))
      .groupBy(col("group"), col("k"))
      .agg(sum(when(col("__id") <= col("thr"), col("t")).otherwise(0L))
        .as("n"))
    val pts = v.join(n, Seq("group", "k"))
      .filter(col("v") > 0 && col("n") > 0)
    val x = log(col("n").cast(DoubleType))
    val y = log(col("v").cast(DoubleType))
    def fold(term: Column): Column =
      aggregate(
        sort_array(collect_list(struct(col("k").as("k"), term.as("t")))),
        lit(0.0), (acc, e) => acc + e("t"))
    val nd = col("n_points").cast(DoubleType)
    // group totals from the already-aggregated side tables — no third
    // corpus pass
    val totals = docToks.groupBy(col("group"))
      .agg(sum(col("t")).as("n_tokens"))
      .join(firstDoc.groupBy(col("group"))
        .agg(count(lit(1)).as("n_types")), Seq("group"))
    pts.groupBy(col("group"))
      .agg(count(lit(1)).as("n_points"),
        fold(x).as("sx"), fold(y).as("sy"),
        fold(x * y).as("sxy"), fold(x * x).as("sxx"))
      // a 1-point group has no slope (0/0); drop it on both engines
      .filter(col("n_points") >= 2)
      .withColumn("beta",
        (nd * col("sxy") - col("sx") * col("sy"))
          / (nd * col("sxx") - col("sx") * col("sx")))
      .withColumn("lnk",
        (col("sy") - col("beta") * col("sx")) / nd)
      .join(totals, Seq("group"))
      .select(col("group"), col("n_points"), col("n_tokens"),
        col("n_types"), col("beta"), col("lnk"))
  }

  /** Zipf rank-frequency fit per group: OLS of y = ln(count) on
    * x = ln(rank) over the group's top-`topV` words (rank by count
    * desc, word asc), returning
    * `(group, n_points, c1, slope, intercept)` — `c1` the modal word's
    * count, slope ≈ −1 for natural text.
    *
    * 100 TB shape: the vocabulary table (one row per (group, word))
    * is already corpus-independent in size, and the top-V selection is
    * TWO-PHASE so no reducer ever sorts a whole group's vocabulary:
    * phase 1 takes a local top-V inside each (group, word-hash bucket)
    * via a bounded sorted-slice aggregation (each bucket holds ~1/`buckets`
    * of the vocab), phase 2 ranks the surviving `buckets × topV` rows
    * per group — thousands, not millions — in one tiny window. The OLS
    * sums fold in rank-ascending order; slope/intercept are the
    * standard closed forms evaluated in one fixed expression each.
    */
  def zipfSlope(df: DataFrame, groupCol: String, textCol: String,
      topV: Int = 64, buckets: Int = 32): DataFrame =
    zipfSlopeFromCounts(wordCounts(df, groupCol, textCol), topV, buckets)

  /** [[zipfSlope]] over a prebuilt (group, w, c) table — multi-part
    * tables (the [[graft.streaming.StreamingLexical]] store) merge by
    * per-key sum first, so the incremental fit equals the batch fit
    * exactly.
    */
  def zipfSlopeFromCounts(wc: DataFrame, topV: Int = 64,
      buckets: Int = 32): DataFrame = {
    val counts = wc.groupBy(col("group"), col("w").as("__w"))
      .agg(sum(col("c")).as("c"))
    // phase 1: bounded local top-V per (group, bucket); struct(-c, w)
    // ascending == (c desc, w asc), the global total order
    val local = counts
      .groupBy(col("group"), pmod(xxhash64(col("__w")), lit(buckets)).as("__b"))
      .agg(slice(sort_array(collect_list(
        struct((-col("c")).as("negc"), col("__w").as("w")))), 1, topV)
        .as("cand"))
      .select(col("group"), explode(col("cand")).as("e"))
      .select(col("group"), (-col("e.negc")).as("c"), col("e.w").as("w"))
    // phase 2: exact rank over <= buckets*topV survivors per group
    val ranked = local
      .withColumn("rank", row_number().over(
        Window.partitionBy("group").orderBy(col("c").desc, col("w").asc)))
      .filter(col("rank") <= topV)
    val x = log(col("rank").cast(DoubleType))
    val y = log(col("c").cast(DoubleType))
    def fold(term: Column): Column =
      aggregate(
        sort_array(collect_list(struct(col("rank").as("r"), term.as("t")))),
        lit(0.0), (acc, e) => acc + e("t"))
    val nd = col("n_points").cast(DoubleType)
    ranked
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n_points"),
        max(when(col("rank") === 1, col("c"))).as("c1"),
        fold(x).as("sx"), fold(y).as("sy"),
        fold(x * y).as("sxy"), fold(x * x).as("sxx"))
      .withColumn("slope",
        (nd * col("sxy") - col("sx") * col("sy"))
          / (nd * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx")) / nd)
      .select(col("group"), col("n_points"), col("c1"),
        col("slope"), col("intercept"))
  }
}
