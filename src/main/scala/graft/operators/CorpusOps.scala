package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Corpus-management operators for the training-data tier: deterministic
  * split assignment, token-budget shard packing, vocabulary building.
  * All arithmetic is exact (integer buckets, integer running sums), so
  * every operator is oracle-checkable bitwise.
  */
object CorpusOps {

  /** Deterministic train/val/test assignment by content-hash bucket:
    * `bucket = md5(key)[lower 60 bits] mod Σweights`, walked through the
    * cumulative weights. Hash-based splits are the production standard
    * because they are stable under reruns, cluster resizing, row order,
    * and incremental corpus growth — a doc keeps its split forever,
    * which `sample()`/`randomSplit()` cannot promise. Pure codegen'd
    * column expressions, shuffle-free.
    *
    * @param splits (name, weight) pairs, e.g. ("train",90),("val",5),("test",5).
    */
  def splitAssign(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    val total = splits.map(_._2).sum
    // 15 hex chars = 60 bits: fits a signed long exactly, and matches
    // the oracle's ('0x' || substr(md5, 18, 15))::BIGINT
    val bucket = pmod(
      conv(substring(md5(to_binary(col(keyCol).cast("string"), lit("utf-8"))),
        18, 15), 16, 10).cast(LongType),
      lit(total.toLong))
    val assigned = splits.scanLeft(("", 0)) { case ((_, cum), (name, w)) =>
      (name, cum + w)
    }.tail.foldRight(lit(splits.last._1)) { case ((name, cumHi), rest) =>
      when(bucket < cumHi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }

  /** Pack docs (in `orderCol` order) into shards of ~`budget` tokens:
    * `shard_id = tokens_before_this_doc DIV budget` — the standard way to
    * cut a corpus into approximately-equal training shards while keeping
    * a deterministic document order.
    *
    * A naive global-ORDER window is a single-partition sort — dead at
    * 100 TB. This is the two-phase form ([[prefixBefore]]): cut
    * `orderCol` into contiguous buckets, one tiny per-bucket total
    * aggregation (O(buckets) rows to the driver, same justified pattern
    * as the paginator's stats), broadcast the prefix offsets back, then
    * a per-bucket window does the local running sum.
    *
    * @param orderCol unique non-null NUMERIC ordering column (doc id).
    * @param tokenCol per-doc token count (long-castable).
    */
  def packShards(df: DataFrame, orderCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    prefixBefore(df, orderCol, col(tokenCol).cast(LongType), "__before")
      .withColumn("shard_id", expr(s"__before DIV ${budget}L"))
      .drop("__before")
  }

  /** NEXT-FIT sequence packing: place documents (ascending `orderCol`)
    * into fixed-capacity training sequences of `seqLen` tokens — the
    * packing step between [[packShards]] (which lets a shard boundary
    * fall mid-document) and the trainer, where short documents share a
    * context window instead of wasting it on padding. A document that
    * does not fit the current sequence's remainder starts a new one; a
    * document of ≥ `seqLen` tokens sits alone (the uniform overflow
    * rule — its successor necessarily overflows too).
    *
    * Parallel shape: packing is a sequential fold, so it runs
    * independently per BUCKET of `bucketDocs` order-contiguous docs
    * (sequences never span buckets — each bucket is a worker's slice,
    * exactly how a shard writer consumes it): one map-side-combinable
    * `groupBy(bucket)` shuffle, then an in-bucket sorted fold whose
    * state is two longs plus the emitted list (the array-append fold
    * copies O(bucketDocs²) struct slots worst-case — `bucketDocs`
    * bounds that constant, keep it ≤ a few thousand).
    *
    * Determinism: pure integer arithmetic over exact token counts —
    * every engine replays the same packing. Output: `(orderCol,
    * n_tokens, bucket, seq, seq_offset)`; `seq` is 0-based within the
    * bucket, `seq_offset` the token offset of the doc inside its
    * sequence.
    */
  def packSequences(df: DataFrame, orderCol: String, tokenCol: String,
      seqLen: Long, bucketDocs: Long = 1024L): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(bucketDocs > 0, s"bucketDocs must be positive, got $bucketDocs")
    val emptyOut = "CAST(array() AS " +
      "ARRAY<STRUCT<o: BIGINT, t: BIGINT, s: BIGINT, off: BIGINT>>)"
    df
      .select(col(orderCol).cast(LongType).as("__ord"),
        col(tokenCol).cast(LongType).as("__tok"))
      .withColumn("__bucket", expr(
        s"(__ord - pmod(__ord, ${bucketDocs}L)) div ${bucketDocs}L"))
      .groupBy(col("__bucket"))
      .agg(sort_array(collect_list(
        struct(col("__ord"), col("__tok")))).as("__ds"))
      .withColumn("__packed", aggregate(
        col("__ds"),
        struct(lit(0L).as("seq"), lit(0L).as("fill"),
          expr(emptyOut).as("out")),
        (acc, x) => {
          val newSeq = acc.getField("fill") > 0 &&
            acc.getField("fill") + x.getField("__tok") > lit(seqLen)
          val seq = when(newSeq, acc.getField("seq") + 1)
            .otherwise(acc.getField("seq"))
          val off = when(newSeq, lit(0L)).otherwise(acc.getField("fill"))
          struct(seq.as("seq"), (off + x.getField("__tok")).as("fill"),
            concat(acc.getField("out"), array(struct(
              x.getField("__ord").as("o"), x.getField("__tok").as("t"),
              seq.as("s"), off.as("off")))).as("out"))
        }))
      .select(col("__bucket"), explode(col("__packed").getField("out")).as("__e"))
      .select(col("__e.o").as(orderCol), col("__e.t").as("n_tokens"),
        col("__bucket").as("bucket"), col("__e.s").as("seq"),
        col("__e.off").as("seq_offset"))
  }

  /** Contiguous 0-based global order index ("rank") over `orderCol`
    * without a global sort — `row_number() OVER (ORDER BY x) - 1` is a
    * single-partition sort at 100 TB; this is the same deterministic
    * two-phase prefix machinery as [[packShards]] with a count of 1 per
    * row: the training-order position a shard writer stamps on each doc.
    *
    * @param orderCol unique non-null NUMERIC ordering column.
    */
  def globalOrderIndex(df: DataFrame, orderCol: String,
      outCol: String = "rank"): DataFrame =
    prefixBefore(df, orderCol, lit(1L), outCol)

  /** Deterministic corpus shuffle: a contiguous 0-based training-order
    * permutation, ranked by the md5 image of `(key, seed)` — the order a
    * shard writer consumes. Hash-ranked shuffles are the production
    * standard for the same reason hash splits are ([[splitAssign]]):
    * stable under reruns, partitioning, and engine, while `orderBy(rand)`
    * is none of those. A different `seed` gives an independent
    * permutation — one per training epoch. The key string appends as a
    * tiebreaker so hash-colliding DISTINCT keys still get distinct,
    * deterministic ranks; like [[splitAssign]], `keyCol` must be unique
    * (rows sharing a key would tie on the full sort key and their
    * relative order would be partition-dependent). Ranks come from
    * [[globalOrderIndex]]'s two-phase prefix sum — no global
    * single-partition sort.
    */
  def shuffleOrder(df: DataFrame, keyCol: String, seed: String = "",
      outCol: String = "shuffle_rank"): DataFrame =
    prefixBefore(
      df.withColumn("__shuf", conv(
        substring(md5(to_binary(
          concat(col(keyCol).cast("string"), lit(":" + seed)),
          lit("utf-8"))), 18, 15), 16, 10).cast(LongType)),
      "__shuf", lit(1L), outCol, tiebreak = Some(keyCol))
      .drop("__shuf")

  /** Curriculum training order: contiguous 0-based rank sorted by a
    * coarse `difficulty` bucket (easy first), hash-shuffled WITHIN each
    * bucket — the practical curriculum-learning schedule (Bengio 2009):
    * a total order on difficulty would overfit the metric's noise and
    * serialize same-score runs, so difficulty is bucketed and the
    * in-bucket order is the [[shuffleOrder]] md5 permutation (a fresh
    * one per `seed`/epoch). Same two-phase prefix machinery — no global
    * single-partition sort; the composite decimal key
    * `bucket·2⁶⁰ + shuffle_hash` keeps (bucket, hash) lexicographic in
    * one numeric the bucket-boundary sampler can quantile.
    * `keyCol` must be unique (it tiebreaks hash collisions).
    */
  def curriculumOrder(df: DataFrame, keyCol: String, difficulty: Column,
      seed: String = "", outCol: String = "curriculum_rank"): DataFrame =
    prefixBefore(
      df.withColumn("__shuf", conv(
          substring(md5(to_binary(
            concat(col(keyCol).cast("string"), lit(":" + seed)),
            lit("utf-8"))), 18, 15), 16, 10).cast(LongType))
        .withColumn("__ck",
          difficulty.cast(DecimalType(38, 0))
            * lit(1152921504606846976L) + col("__shuf")),
      "__ck", lit(1L), outCol, tiebreak = Some(keyCol))
      .drop("__shuf", "__ck")

  /** Exclusive running sum of `value` in `orderCol` order, as `outCol`.
    *
    * Bucket membership MUST be a pure function of the row's own value:
    * the totals job and the final window job are separate query
    * executions, and anything physical — `spark_partition_id()` after a
    * `repartitionByRange`, say — can disagree between them (range
    * boundaries are re-sampled per execution with an RDD-id-derived seed,
    * and AQE coalesces each plan independently), silently corrupting the
    * offsets near partition edges. So the boundaries are computed ONCE
    * driver-side (quantiles of `orderCol`; only balance, never
    * correctness, depends on their accuracy) and baked into the plan as
    * literals.
    */
  /** `tiebreak` orders rows that share an `orderCol` value (required for
    * determinism whenever `orderCol` alone is not unique — e.g. the
    * 60-bit shuffle hash). Equal `orderCol` values always land in the
    * same bucket (the bucket predicate is strict), so only the
    * within-bucket window needs the extra key.
    */
  private def prefixBefore(df: DataFrame, orderCol: String, value: Column,
      outCol: String, tiebreak: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nBuckets = spark.sessionState.conf.numShufflePartitions
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val boundaries =
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
    // bucket = #boundaries strictly below the value; ties at a boundary
    // land low consistently. Double collapse past 2^53 only merges
    // buckets (balance), never reorders them.
    val bucket =
      if (boundaries.isEmpty) lit(0)
      else aggregate(lit(boundaries), lit(0), (acc, bd) =>
        acc + when(col(orderCol).cast("double") > bd, 1).otherwise(0))
    val bucketed = df.withColumn("__b", bucket)
      .withColumn("__v", value)
    // O(buckets) rows: bucket id → value total
    val totals = bucketed.groupBy("__b")
      .agg(sum(col("__v")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, cum), (b, t)) =>
      (b, cum + t)
    }.init.zip(totals).map { case ((_, off), (b, _)) => (b, off) }
    val offDf = offsets.toSeq.toDF("__b", "__offset")
    val w = Window.partitionBy("__b")
      .orderBy(col(orderCol) +: tiebreak.map(col).toSeq: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offDf), Seq("__b"))
      .withColumn(outCol,
        coalesce(sum(col("__v")).over(w), lit(0L)) + col("__offset"))
      .drop("__b", "__v", "__offset")
  }

  /** Key-skew audit — the counts-of-counts report read before keying a
    * 100 TB shuffle: per order-of-magnitude bucket of per-key row
    * count (1–9, 10–99, …), how many keys land there, how many rows
    * they carry, the largest key, and the rows' ppm share. A heavy top
    * bucket says "salt this key or switch to an AQE skew join" BEFORE
    * the job runs; the magnitude bucket is `length(CAST(c AS STRING))`
    * — exact, monotone, and engine-identical (no float log2, whose
    * power-of-two edges round differently across engines).
    *
    * Shape: one count shuffle on the key, then O(distinct keys) rows
    * into a tiny magnitude groupBy — the audit never touches row
    * payloads.
    */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("__total"))
    counts
      .groupBy(length(col("c").cast("string")).as("magnitude"))
      .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        max(col("c")).as("max_count"))
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("n_rows * 1000000L div __total"))
      .drop("__total")
  }

  /** k-anonymity audit over quasi-identifier columns: every row joined
    * with its quasi-group's size and a `suppressed` flag for groups
    * smaller than `k` — the release rule that a record's
    * quasi-identifier combination must be shared by at least k records
    * (Sweeney 2002), as suppression (the generalization-hierarchy
    * variant is policy-specific and belongs to the caller). Suppressed
    * rows are FLAGGED, not dropped — the audit face reports them, the
    * release face filters.
    *
    * Scale shape: one map-side-combined group count over the quasi
    * columns (distinct-combination cardinality, usually broadcastable)
    * joined back to the rows — no window, no second scan of wide
    * columns.
    *
    * Output: `(idCol, quasiCols…, group_size, suppressed)`.
    */
  def kAnonymity(df: DataFrame, idCol: String, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be >= 2, got $k")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
    df.select((idCol +: quasiCols).map(col): _*)
      .join(counts, quasiCols)
      .withColumn("suppressed", col("group_size") < k)
      .select((col(idCol) +: quasiCols.map(col)) ++
        Seq(col("group_size"), col("suppressed")): _*)
  }

  /** N-gram novelty of each document against a REFERENCE corpus: how
    * many of the doc's distinct word n-grams the reference has never
    * seen — the measuring complement of [[decontaminate]] (that one
    * drops overlap with a tiny eval set; this one scores freshness
    * against a corpus-sized reference: "how much does this crawl add
    * over what we already have?"). The standard new-data-value signal
    * beside [[graft.operators.ImportanceResampling]]'s target-fit
    * score.
    *
    * Scale shape: both sides reduce to DISTINCT gram tables (two-level
    * map-side-combinable aggregations), and the membership probe is an
    * equi-join keyed on the 8-byte `xxhash64(gram)` — the [[dupSpans]]
    * adjudication: grams never cross the wire as strings, and a 64-bit
    * collision can only mark a truly-novel gram as known (never
    * invents novelty). Only docs with ≥ 1 gram (≥ n tokens) appear.
    *
    * Determinism: exact BIGINT counts plus one integral-division ppm.
    * Output: `(idCol, n_grams, n_known, n_novel, novelty_ppm)`.
    */
  def noveltyScore(corpus: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3): DataFrame = {
    import graft.functions.TextFunctions
    val cg = corpus.select(col(idCol),
      explode(TextFunctions.wordShingles(col(textCol), shingleN)).as("__g"))
      .select(col(idCol), xxhash64(col("__g")).as("__h"))
    val rg = reference.select(
      explode(TextFunctions.wordShingles(col(textCol), shingleN)).as("__g"))
      .select(xxhash64(col("__g")).as("__h"))
      .distinct()
    cg.join(rg.withColumn("__known", lit(1L)), Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("__known")), lit(0L)).as("n_known"))
      .withColumn("n_novel", col("n_grams") - col("n_known"))
      .withColumn("novelty_ppm",
        expr("n_novel * 1000000L div n_grams"))
  }

  /** Materialized novelty index of a reference corpus: one row per
    * DISTINCT gram hash, `(h, n_docs)`. The 100 TB shape: build it
    * once (write partitioned by `pmod(h, bands)` like
    * `Dedup.minhashIndex`), then [[noveltyAgainstIndex]] probes a new
    * batch without ever re-shingling the reference — the same
    * index-once / probe-increment contract as the MinHash, ANN, and
    * suffix indexes. `n_docs` rides along so callers can also weight
    * novelty by reference rarity.
    */
  def noveltyIndex(reference: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    import graft.functions.TextFunctions
    reference.select(col(idCol).as("__id"),
      explode(TextFunctions.wordShingles(col(textCol), shingleN)).as("__g"))
      .select(col("__id"), xxhash64(col("__g")).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** [[noveltyScore]] of a batch against a prebuilt [[noveltyIndex]] —
    * equal output to scoring against the reference directly, with the
    * reference never re-read: the probe join touches the index table
    * only. Same schema as [[noveltyScore]].
    */
  def noveltyAgainstIndex(batch: DataFrame, index: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3): DataFrame = {
    import graft.functions.TextFunctions
    batch.select(col(idCol),
      explode(TextFunctions.wordShingles(col(textCol), shingleN)).as("__g"))
      .select(col(idCol), xxhash64(col("__g")).as("h"))
      .join(index.select(col("h"), lit(1L).as("__known")), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("__known")), lit(0L)).as("n_known"))
      .withColumn("n_novel", col("n_grams") - col("n_known"))
      .withColumn("novelty_ppm",
        expr("n_novel * 1000000L div n_grams"))
  }

  /** Benchmark decontamination: for every (corpus doc, eval doc) pair
    * sharing word shingles, the distinct-shingle overlap and the
    * containment ratio `overlap / |eval shingles|` — the standard
    * decontamination score (containment, not Jaccard: a benchmark item
    * embedded in a long document should still flag).
    *
    * Scale shape: eval benchmarks are tiny next to a 100 TB corpus, so
    * the eval shingle index is `broadcast()` — the corpus is never
    * shuffled on shingle, only the per-(corpus, eval) overlap counts
    * aggregate (map-side partial). Returns pairs at or above
    * `minContainment`.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3,
      minContainment: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions
    def shingles(df: DataFrame, as: String) = df.select(
      col(idCol).as(as),
      explode(TextFunctions.wordShingles(col(textCol), shingleN)).as("__s"))
    val eSh = shingles(evalSet, "eval_id")
    val eSizes = eSh.groupBy("eval_id").agg(count(lit(1)).as("__n_eval"))
    shingles(corpus, "corpus_id")
      .join(broadcast(eSh), Seq("__s"))
      .groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("overlap"))
      .join(broadcast(eSizes), Seq("eval_id"))
      .withColumn("containment",
        col("overlap").cast("double") / col("__n_eval").cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("corpus_id"), col("eval_id"), col("overlap"),
        col("containment"))
  }

  /** Gopher-style quality gates over exact-integer text statistics:
    * word count bounds, mean word length bounds, alpha-word fraction.
    * Emits the per-rule flags (so a pipeline can audit WHY a doc
    * dropped) plus the conjunction. Pure codegen'd expressions.
    */
  def qualityGates(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaWordFrac: Double = 0.8): DataFrame = {
    val words = split(col(textCol), " ")
    val nWords = size(words).cast(LongType)
    val meanLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / nWords.cast("double")
    val alphaFrac = size(filter(words, w => w.rlike("[A-Za-z]")))
      .cast("double") / nWords.cast("double")
    df.withColumn("n_words", nWords)
      .withColumn("gate_n_words",
        nWords >= minWords && nWords <= maxWords)
      .withColumn("gate_mean_word_len",
        meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen)
      .withColumn("gate_alpha_frac", alphaFrac >= minAlphaWordFrac)
      .withColumn("keep", col("gate_n_words") &&
        col("gate_mean_word_len") && col("gate_alpha_frac"))
  }

  /** Gopher/FineWeb-style repetition statistics per document:
    * duplicate-word fraction (`1 - distinct/total`) and top-bigram
    * fraction (occurrences of the most frequent word 2-gram over all
    * 2-grams), plus the repetition gate (`top_bigram_frac <= maxTopBigram`,
    * the published heuristic for machine-generated boilerplate).
    *
    * Scale shape (r13): scan → project — no join/agg exchange at any
    * corpus size. The grouping keys (doc, word) / (doc, bigram) never
    * cross documents, so the native
    * [[graft.expressions.WordRepStats]] kernel computes all four
    * sufficient statistics doc-locally with EXACT byte grouping
    * (this operator's oracle groups by the bigram STRING, so unlike
    * [[ngramRepetition]]'s oracle-replayed md5-52 no hash semantics
    * may leak into results — the kernel's 32-bit hash only
    * pre-buckets a primitive sort and equal-hash runs resolve by
    * byte comparison). Replaces the bigram explode →
    * `groupBy(doc, bigram-string)` → `groupBy(doc)` → join chain
    * that shuffled the corpus's bigram text; spec pins equality
    * (WordRepStatsSpec), oracle SQL unchanged.
    */
  /** The [[graft.expressions.WordRepStats]] sufficient-statistics struct
    * as a plain column — materialize it ONCE (`withColumn`) and project
    * fields, so composed pipelines (`q_attrition_ledger`) ride the
    * doc-local kernel without re-evaluating it per derived flag.
    */
  def wordRepStruct(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.WordRepStats(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      maxTopBigram: Double = 0.18): DataFrame = {
    val st = df.select(col(idCol).as("__doc"),
      wordRepStruct(col(textCol)).as("__r"))
    st.select(col("__doc"), col("__r.n_words").as("n_words"),
        col("__r.n_distinct_words").as("n_distinct_words"),
        col("__r.top_bigram").as("__top"),
        col("__r.n_bigrams").as("__tot"))
      .withColumn("dup_word_frac",
        lit(1.0) - col("n_distinct_words").cast("double") /
          col("n_words").cast("double"))
      .withColumn("top_bigram_frac",
        when(col("__tot") > 0L,
          col("__top").cast("double") / col("__tot").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("gate_repetition", col("top_bigram_frac") <= maxTopBigram)
      .select(col("__doc").as(idCol), col("n_words"),
        col("n_distinct_words"), col("dup_word_frac"),
        col("top_bigram_frac"), col("gate_repetition"))
  }

  /** Line/paragraph half of the Gopher repetition battery (Rae 2022
    * Table A1): per document, for units `line` (split on `\n`) and
    * `para` (split on `\n\n`),
    *
    *   - `dup_*_ppm` — fraction of units that are repeats of an earlier
    *     occurrence (`(n_units − n_distinct) / n_units`), and
    *   - `dup_*_char_ppm` — fraction of unit characters inside those
    *     repeat occurrences (`Σ (cnt−1)·len / Σ cnt·len`),
    *
    * both as exact integer ppm (no doubles), plus `gate_line_rep`
    * applying the published drop thresholds (dup-line > 0.30,
    * dup-para > 0.30, dup-line-chars > 0.20, dup-para-chars > 0.20).
    * Empty units (consecutive separators) count like any other unit —
    * identical convention on both engines.
    *
    * Scale shape (r13): scan → project — no join/agg exchange at any
    * corpus size. The grouping key (doc, unit, value) never crosses
    * documents, so the native [[graft.expressions.LineRepStats]]
    * kernel computes both unit kinds' sufficient statistics
    * doc-locally with string-EXACT byte grouping (this oracle groups
    * by the unit STRING — same rule as [[repetitionStats]], no hash
    * semantics may leak into results). Replaces the unit explode →
    * `groupBy(doc, u, value)` → `groupBy(doc, u)` → pivot chain that
    * shuffled the corpus's line/paragraph text; spec pins equality
    * (LineRepStatsSpec), oracle SQL unchanged.
    */
  def lineRepetition(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val pivoted = df.select(col(idCol).as("__doc"),
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.expressions.LineRepStats(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            col(textCol)))).as("__r"))
      .select(col("__doc"),
        col("__r.n_lines").as("n_lines"),
        (col("__r.n_lines") - col("__r.dist_lines")).as("__dl"),
        col("__r.dup_line_chars").as("__dlc"),
        col("__r.tot_line_chars").as("__ltc"),
        col("__r.n_paras").as("n_paras"),
        (col("__r.n_paras") - col("__r.dist_paras")).as("__dp"),
        col("__r.dup_para_chars").as("__dpc"),
        col("__r.tot_para_chars").as("__ptc"))
      .withColumn("dup_line_ppm",
        expr("__dl * 1000000 div greatest(n_lines, 1L)"))
      .withColumn("dup_line_char_ppm", expr(
        "CAST(CAST(__dlc AS DECIMAL(38,0)) * 1000000" +
          " div greatest(__ltc, 1L) AS BIGINT)"))
      .withColumn("dup_para_ppm",
        expr("__dp * 1000000 div greatest(n_paras, 1L)"))
      .withColumn("dup_para_char_ppm", expr(
        "CAST(CAST(__dpc AS DECIMAL(38,0)) * 1000000" +
          " div greatest(__ptc, 1L) AS BIGINT)"))
      .withColumn("gate_line_rep",
        col("dup_line_ppm") <= 300000L && col("dup_para_ppm") <= 300000L &&
          col("dup_line_char_ppm") <= 200000L &&
          col("dup_para_char_ppm") <= 200000L)
    pivoted.select(col("__doc").as(idCol), col("n_lines"),
      col("dup_line_ppm"), col("dup_line_char_ppm"), col("n_paras"),
      col("dup_para_ppm"), col("dup_para_char_ppm"), col("gate_line_rep"))
  }

  /** The REST of the Gopher repetition battery (Rae 2022 Table A1;
    * [[repetitionStats]] carries the word/bigram-count half): per
    * document, the character-coverage ppm of
    *
    *   - the single MOST FREQUENT word n-gram for each `n ∈ topNs`
    *     (`top{n}_ppm = c·len(gram)·10⁶ div len(text)`, argmax by
    *     (count desc, gram asc) — deterministic on both engines), and
    *   - ALL duplicated word n-grams (count ≥ 2) for each `n ∈ dupNs`
    *     (`dup{n}_ppm = Σ c·len(gram)·10⁶ div len(text)`).
    *
    * Coverage uses the standard occurrences×length convention (no
    * interval union — overlapping occurrences overcount, exactly as the
    * published filters compute it), so every stat is an exact integer
    * ppm: no doubles anywhere, the gate hash-compares. `gate_ngram_rep`
    * applies the published drop thresholds (top2 > 0.20, top3 > 0.18,
    * top4 > 0.16, dup5 > 0.15, dup10 > 0.10 — scaled to ppm).
    *
    * Scale shape (r13): scan → project → project — no join/agg
    * exchange at any corpus size (PlanAudit: 5 exchanges → 1, the
    * survivor being the gate face's total-ORDER-BY sort). The aggregation key is (doc, n, gram-hash) —
    * it never crosses documents — so the whole per-(doc, n) fold runs
    * DOC-LOCALLY inside the native
    * [[graft.expressions.WordGramRepStats]] kernel: one byte pass per
    * document computes every n's (topchars, dupchars) without ever
    * assembling a gram string (word n-grams of a space-joined split
    * are byte SLICES of the original text). This supersedes both
    * earlier shapes — the r11 string-keyed and the r12 hash-keyed
    * (`(doc, n, h, len)` 28-byte rows, ~24× byte cut) explode +
    * shuffle — because at 100 TB even the slimmed exchange shipped
    * the corpus's entire gram stream, and at local[32] the ~100M
    * per-occurrence rows dominated CPU+GC (sf1 d90, same host band:
    * 58 s → 11.8 s). The top-gram argmax tiebreaks on the hash — (count desc,
    * h asc) — which DuckDB replays bit-exactly
    * (`('0x' || substr(md5(gram), 20, 13))::BIGINT`), so the oracle
    * stays hash-exact; a 52-bit collision WITHIN one (doc, n) group
    * merges two gram counts identically on both engines (`max(len)`
    * is the deterministic length under merge).
    * Should a corpus with enormous per-doc gram counts make 52-bit
    * within-(doc, n) collisions a live concern, the safe widening is
    * 15 hex chars / 60 bits (`substr(md5, 18, 15)`) — 16 chars would
    * overflow signed BIGINT on both engines.
    */
  def ngramRepetition(df: DataFrame, idCol: String, textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4), dupNs: Seq[Int] = Seq(5, 10))
      : DataFrame = {
    require(topNs.nonEmpty || dupNs.nonEmpty, "need at least one n")
    require((topNs ++ dupNs).forall(_ >= 2), "n-gram sizes must be >= 2")
    val ns = (topNs ++ dupNs).distinct.sorted
    // Since r13 the whole aggregation is DOC-LOCAL: the native
    // [[graft.expressions.WordGramRepStats]] kernel computes, per
    // document and per n, the (topchars, dupchars) sufficient
    // statistics in one byte pass (word n-grams of a space-joined
    // split are byte slices of the original text — no gram string is
    // ever assembled) over the same portable md5-52 gram-hash groups
    // the DuckDB oracle replays. The aggregation key was (doc, n, h)
    // — it never crosses documents — so the previous full-corpus
    // explode → hash-agg exchange (~100M occurrence rows at sf1, the
    // corpus's entire gram stream at 100 TB) bought nothing: this
    // operator is now scan → project → project, no join/agg exchange
    // at any scale (the gate face's ORDER BY keeps one sort exchange). Bitwise equality against the relational
    // groupBy(doc,n,h) chain is spec-pinned (WordGramRepStatsSpec);
    // the oracle SQL is unchanged.
    val stats = df.select(col(idCol).as("__doc"),
      length(col(textCol)).cast(LongType).as("n_chars"),
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.expressions.WordGramRepStats(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            col(textCol)), ns)).as("__st"))
    // per-n columns straight off the (ns-ordered) struct array; NULL
    // text → NULL array → coalesce 0, like the old left join
    val topCols = topNs.map(n =>
      coalesce(col("__st")(ns.indexOf(n))("topchars"), lit(0L))
        .as(s"__tc$n"))
    val dupCols = dupNs.map(n =>
      coalesce(col("__st")(ns.indexOf(n))("dupchars"), lit(0L))
        .as(s"__dc$n"))
    val agged = stats.select(
      (col("__doc") +: col("n_chars") +: (topCols ++ dupCols)): _*)
    // chars·10⁶ widened to DECIMAL(38,0) before the integral div (the
    // q_abc_analysis cum_ppm pattern) — a gigabyte-scale document's
    // c·len·10⁶ would wrap a BIGINT
    // greatest(n_chars, 1): an empty doc has no grams (numerators 0), so
    // the clamp only keeps the div total — Spark would NULL on /0 where
    // DuckDB raises
    def ppm(src: String): Column = expr(
      s"CAST(CAST($src AS DECIMAL(38,0)) * 1000000" +
        " div greatest(n_chars, 1L) AS BIGINT)")
    val withPpm = (topNs.map(n => s"top${n}_ppm" -> ppm(s"__tc$n")) ++
      dupNs.map(n => s"dup${n}_ppm" -> ppm(s"__dc$n")))
      .foldLeft(agged) { case (d, (name, e)) => d.withColumn(name, e) }
    val thresholds = Map(2 -> 200000L, 3 -> 180000L, 4 -> 160000L,
      5 -> 150000L, 6 -> 140000L, 7 -> 130000L, 8 -> 120000L,
      9 -> 110000L, 10 -> 100000L)
    val gate = (topNs.map(n => col(s"top${n}_ppm") <=
        lit(thresholds.getOrElse(n, 100000L))) ++
      dupNs.map(n => col(s"dup${n}_ppm") <=
        lit(thresholds.getOrElse(n, 100000L))))
      .reduce(_ && _)
    withPpm
      .withColumn("gate_ngram_rep", gate)
      .select((col("__doc").as(idCol) +: col("n_chars") +:
        (topNs.map(n => col(s"top${n}_ppm")) ++
          dupNs.map(n => col(s"dup${n}_ppm")) :+
          col("gate_ngram_rep"))): _*)
  }

  /** Per-document keyword extraction: top `k` tokens per doc by
    * tf·(N/df) — the tf-idf ranking with the exact rational idf
    * (`N/df` instead of `log(N/df)`: the log is monotone, so the
    * RANKING is identical, and the score stays an exact
    * integer-over-integer double that compares bitwise against any
    * engine). One shuffle for the (token, doc) counts, a broadcast of
    * the df table (vocab-sized, tiny next to postings), and the
    * bounded per-key top-k window.
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tok = df.select(col(idCol).as("doc"),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= lit(""))).as("token"))
    val td = tok.groupBy(col("token"), col("doc"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = td.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = df.count()
    val scored = td.join(broadcast(dfreq), Seq("token"))
      .withColumn("score",
        col("tf").cast("double") * n / col("df").cast("double"))
    graft.functions.EdgarFunctions.perKeyTopK(scored, k, Seq("doc"),
      Seq(col("score").desc, col("token")))
      .select(col("doc").as(idCol), col("token"), col("tf"), col("df"),
        col("score"))
  }

  /** Corpus vocabulary: lowercase alpha tokens → (term frequency, doc
    * frequency), top `topN` by tf with token tiebreak. Two-level
    * aggregation — per (token, doc) first — so doc frequency needs no
    * `countDistinct` shuffle of raw postings.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame =
    df.select(col(idCol).as("__doc"),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= lit(""))).as("token"))
      .groupBy(col("token"), col("__doc"))
      .agg(count(lit(1)).as("__tf"))
      .groupBy(col("token"))
      .agg(sum(col("__tf")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(topN)

  /** Deterministic per-stratum downsampling: keep a row iff its md5
    * key-bucket (parts-per-million, same 60-bit construction as
    * [[splitAssign]]) falls under the stratum's rate. This is the
    * domain-reweighting primitive of LLM corpus curation ("web at 30%,
    * books at 100%, …"): a pure map-side codegen'd filter — no shuffle,
    * no sort, no RNG — so it is stable under reruns, row order, cluster
    * resizing, and incremental corpus growth, and it composes with any
    * downstream pipeline at 100 TB for free.
    *
    * @param ratesPpm stratum value → keep-rate in parts per million
    *                 (integer, so engines cannot disagree on a float
    *                 threshold). Strata absent from the map are dropped.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      ratesPpm: Map[String, Long]): DataFrame = {
    require(ratesPpm.nonEmpty && ratesPpm.values.forall(r => r >= 0 && r <= 1000000L),
      "rates must be 0..1000000 ppm")
    val bucket = pmod(
      conv(substring(md5(to_binary(col(keyCol).cast("string"), lit("utf-8"))),
        18, 15), 16, 10).cast(LongType),
      lit(1000000L))
    val threshold = ratesPpm.foldLeft(lit(-1L)) { case (acc, (v, r)) =>
      when(col(stratumCol) === v, lit(r)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Solve per-stratum keep-rates that hit a target mixture while keeping
    * as much data as possible: the binding stratum (smallest
    * `have/want`) is kept whole and every other stratum downsamples to
    * proportion. Driver-side pure arithmetic over the (tiny) stratum
    * histogram — feed it `df.groupBy(stratum).count()` results.
    * Returns parts-per-million rates for [[stratifiedSample]].
    */
  def solveMixtureRates(counts: Map[String, Long],
      targets: Map[String, Double]): Map[String, Long] = {
    require(targets.values.forall(_ > 0) &&
      targets.keySet.subsetOf(counts.keySet),
      "targets must be positive and present in counts")
    // binding stratum: the one that runs out first at the target mixture
    val totalAtFull = targets.map { case (k, w) => counts(k) / w }.min
    targets.map { case (k, w) =>
      val keep = w * totalAtFull / counts(k) // ≤ 1 by construction
      k -> math.min(1000000L, math.round(keep * 1000000L))
    }
  }

  /** Snapshot diff between two corpus versions, by content hash: one row
    * per doc id present in either side with a status —
    * `added` (only in `next`), `removed` (only in `prev`), `changed`
    * (both, different content), `unchanged`. The full-outer join keys on
    * the id; content compares by md5, so the shuffle carries 16-byte
    * digests, never document bodies. The everyday op behind corpus
    * versioning: "what moved between crawl 42 and crawl 43, and how much
    * do we re-process?" — feed `added ∪ changed` to
    * [[graft.operators.Dedup.incrementalMinhashPairs]] and the rest of
    * the pipeline never re-reads the unchanged 99%.
    */
  def corpusDiff(prev: DataFrame, next: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def hashed(df: DataFrame, side: String) = df.select(
      col(idCol),
      md5(to_binary(col(textCol), lit("utf-8"))).as(s"__h_$side"))
    hashed(prev, "prev").join(hashed(next, "next"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h_prev").isNull, lit("added"))
          .when(col("__h_next").isNull, lit("removed"))
          .when(col("__h_prev") === col("__h_next"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Pairwise n-gram overlap between corpus slices (sources, languages,
    * snapshots) — the redundancy / cross-contamination diagnostic run
    * before mixing corpora: a source pair with high containment is
    * double-counting its material (or one is a scrape of the other), and
    * an eval slice with nonzero containment in a train slice is
    * contaminated. Emits the COMPLETE pair matrix (grp_a < grp_b),
    * including zero-overlap pairs: n-gram set sizes, intersection size,
    * per-side containment, and Jaccard — all exact integers plus
    * single-division doubles, so the whole thing is oracle-checkable.
    *
    * Scale shape: one distinct over (group, gram) — a single shuffle
    * keyed by the pair; the intersection join keys on the gram, so a
    * gram shared by g groups contributes g² rows — bounded by the number
    * of slices squared, never by corpus size. Slice sizes broadcast.
    */
  def sourceOverlap(df: DataFrame, textCol: String, groupCol: String,
      n: Int = 3): DataFrame = {
    val grams = df.select(col(groupCol).as("grp"),
      explode(graft.functions.TextFunctions.wordShingles(col(textCol), n))
        .as("gram"))
      .distinct()
    val sizes = grams.groupBy("grp").agg(count(lit(1)).as("n_grams"))
    val pairs = broadcast(sizes.select(col("grp").as("grp_a"),
        col("n_grams").as("n_a")))
      .join(broadcast(sizes.select(col("grp").as("grp_b"),
        col("n_grams").as("n_b"))), col("grp_a") < col("grp_b"))
    val common = grams.select(col("grp").as("grp_a"), col("gram"))
      .join(grams.select(col("grp").as("grp_b"), col("gram")), Seq("gram"))
      .filter(col("grp_a") < col("grp_b"))
      .groupBy("grp_a", "grp_b")
      .agg(count(lit(1)).as("n_common"))
    pairs.join(common, Seq("grp_a", "grp_b"), "left")
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("containment_a",
        col("n_common").cast("double") / col("n_a").cast("double"))
      .withColumn("containment_b",
        col("n_common").cast("double") / col("n_b").cast("double"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")).cast("double"))
  }

  /** Per-shard manifest over [[packShards]] output: doc count, token sum,
    * id range, and an order-insensitive content checksum (a SUM of
    * per-doc digests — associative and commutative, so the aggregation
    * stays map-side partial). The artifact a training job reads to plan
    * epochs and to detect shard corruption/drift without rescanning
    * documents. Pass `xxhash64(text)` (fastest) or an oracle-friendly
    * md5-derived digest; the sum runs in DECIMAL(38,0) so full-range
    * 64-bit digests cannot overflow ANSI arithmetic, then folds to a
    * BIGINT residue (mod Long.MaxValue) so the emitted checksum is a
    * plain 64-bit integer — identical canonical form in every engine
    * (Spark decimal vs DuckDB HUGEINT render differently; a BIGINT
    * doesn't). Collision odds are unchanged for drift detection.
    */
  def shardManifest(packed: DataFrame, idCol: String, tokenCol: String,
      checksum: org.apache.spark.sql.Column): DataFrame =
    packed.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("n_tokens"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"),
        (sum(checksum.cast("decimal(38,0)")) % lit(Long.MaxValue))
          .cast("long").as("content_checksum"))

  /** Deterministic mixture UPsampling — epoch reweighting ("books at 2.5
    * epochs, web at 1"): each row of stratum `s` with rate `r` emits
    * `floor(r)` copies, plus one more iff its hash bucket falls under
    * `frac(r)` (in ppm, the SAME 60-bit md5 bucket as
    * [[stratifiedSample]] — so `upsampleMixture(rates ≤ 1)` keeps exactly
    * the rows `stratifiedSample` keeps). Output carries an `epoch`
    * column (0-based copy index) so downstream shuffles/dedup can tell
    * copies apart.
    *
    * Map-side only (`explode` of a per-row `sequence`), no RNG, stable
    * under reruns / partitioning / corpus growth. Rates in ppm:
    * 2_500_000 = 2.5 epochs.
    */
  def upsampleMixture(df: DataFrame, keyCol: String, stratumCol: String,
      ratesPpm: Map[String, Long]): DataFrame = {
    require(ratesPpm.nonEmpty && ratesPpm.values.forall(_ >= 0),
      "rates must be >= 0 ppm")
    val bucket = pmod(
      conv(substring(md5(to_binary(col(keyCol).cast("string"), lit("utf-8"))),
        18, 15), 16, 10).cast(LongType),
      lit(1000000L))
    val rate = ratesPpm.foldLeft(lit(0L)) { case (acc, (v, r)) =>
      when(col(stratumCol) === v, lit(r)).otherwise(acc)
    }
    val copies = (rate / 1000000L).cast(LongType) +
      when(bucket < pmod(rate, lit(1000000L)), 1L).otherwise(0L)
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1L)))
      .drop("__n")
  }

  /** Cross-document duplicate-span statistics (the relational form of
    * exact substring deduplication à la "Deduplicating Training Data
    * Makes Language Models Better"): for every document, how many of its
    * word `n`-gram positions are covered by an n-gram that also appears
    * in at least one OTHER document, plus the covered fraction — the
    * signal used to strip boilerplate/licence spans before training.
    *
    * Shape for 100 TB: positions explode to one row per n-gram
    * occurrence, the cross-doc test is a distinct (gram, doc) pair count
    * — two-level aggregation, no `countDistinct` of raw postings — and
    * the postings re-join keys on `xxhash64(gram)` (8-byte keys instead
    * of full n-gram strings through the exchange). Map-side partial
    * aggregation applies at every level; nothing is quadratic in
    * documents.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    import graft.functions.TextFunctions
    val grams = df.select(col(idCol).as("__doc"),
      explode(TextFunctions.wordShinglesAll(col(textCol), n)).as("__g"))
      .select(col("__doc"), xxhash64(col("__g")).as("__h"))
    // grams shared by >=2 distinct docs (distinct pairs first, so the
    // doc-count agg is over pre-deduped rows — no countDistinct shuffle)
    val shared = grams.distinct()
      .groupBy("__h").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("__h"), lit(true).as("__dup"))
    grams
      .join(shared, Seq("__h"), "left")
      .groupBy("__doc")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac",
        col("n_dup_grams").cast("double") / col("n_grams").cast("double"))
      .select(col("__doc").as(idCol), col("n_grams"), col("n_dup_grams"),
        col("dup_frac"))
  }

  /** Cap each group at `k` rows chosen by content-hash order — domain
    * capping ("no more than k documents per source/domain"), the standard
    * guard against a handful of giant domains dominating a pretraining
    * mix. Hash order makes the selection deterministic and stable: a doc
    * that survives the cap today still survives after the corpus grows
    * unless k genuinely fills up with lower-hash arrivals, and reruns /
    * repartitioning never change the sample.
    *
    * Scale shape: the per-group selection runs through the bounded-heap
    * [[TopKAggregator]] — map-side partial aggregation keeps ≤2k entries
    * per group per task and ships only per-partition survivors, so the
    * shuffle is O(partitions × groups × k) regardless of group size. A
    * `row_number()` window would shuffle and SORT every row of every
    * giant domain instead.
    *
    * The rank key is the lower 52 bits of `md5(id)` (13 hex chars — fits
    * a double exactly, so the heap's `(score desc, id asc)` order is an
    * exact `(bucket asc, id asc)` order).
    *
    * Returns `(groupCol, sample_rank, idCol)` — semi-join on `idCol` to
    * apply the cap to the corpus.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val topk = udaf(new TopKAggregator(k))
    val bucket = conv(substring(
      md5(to_binary(col(idCol).cast("string"), lit("utf-8"))), 20, 13),
      16, 10).cast(LongType)
    df.select(col(groupCol).as("__g"), col(idCol).cast(LongType).as("__id"),
        (-bucket.cast("double")).as("__s"))
      .groupBy(col("__g"))
      .agg(topk(col("__id"), col("__s")).as("tk"))
      .select(col("__g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("__g").as(groupCol),
        (col("pos") + 1).cast(LongType).as("sample_rank"),
        col("e._2").as(idCol))
  }

  /** The ACTION [[dupSpans]] only measures: rebuild each document with
    * every token covered by a cross-document duplicate n-gram removed
    * (license blocks, navigation chrome, shared boilerplate vanish; the
    * unique prose stays). A duplicate gram starting at token `p` covers
    * positions `p … p+n−1`; covered positions union per doc, surviving
    * tokens rejoin in original order.
    *
    * Scale shape: the cross-doc test is the same two-level distinct
    * (gram, doc) aggregation as [[dupSpans]] (8-byte `xxhash64` keys
    * through the exchange), coverage expands each dup OCCURRENCE by a
    * `sequence` explode, the kept-token anti-join keys on (doc, pos),
    * and the rebuild's per-doc sort is bounded by document length.
    * Returns `(idCol, n_tokens, n_kept, clean_text)`.
    */
  def stripDupSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    import graft.functions.TextFunctions
    val toks = df.select(col(idCol).as("__doc"),
      posexplode(split(col(textCol), " ")).as(Seq("__pos", "__tok")))
    val grams = df.select(col(idCol).as("__doc"),
      posexplode(TextFunctions.wordShinglesAll(col(textCol), n))
        .as(Seq("__gpos", "__g")))
      .select(col("__doc"), col("__gpos"), xxhash64(col("__g")).as("__h"))
    val shared = grams.select(col("__doc"), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("__h"))
    val covered = grams.join(shared, Seq("__h"))
      .select(col("__doc"),
        explode(sequence(col("__gpos"), col("__gpos") + (n - 1))).as("__pos"))
      .distinct()
    toks.join(covered, Seq("__doc", "__pos"), "left_anti")
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("__nk"),
        array_join(transform(
          sort_array(collect_list(struct(col("__pos"), col("__tok")))),
          e => e.getField("__tok")), " ").as("clean_text"))
      .join(df.select(col(idCol).as("__doc"),
        size(split(col(textCol), " ")).cast(LongType).as("n_tokens")),
        Seq("__doc"), "right")
      .select(col("__doc").as(idCol), col("n_tokens"),
        coalesce(col("__nk"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Overlapping token-window chunks — the context-window packing step of
    * a training/RAG pipeline: each document becomes windows of
    * `chunkTokens` whitespace tokens starting every
    * `stride = chunkTokens − overlap` tokens, so consecutive chunks share
    * `overlap` tokens. A start past 0 must contribute at least one token
    * the previous chunk did not cover (`start + overlap < n_tokens`),
    * so the tail never emits a chunk fully contained in its predecessor.
    *
    * Chunk ids are `start / stride` — stable, order-free, derivable from
    * the chunk itself (a re-chunk of a grown corpus reproduces old ids).
    * Pure codegen'd column expressions, shuffle-free, embarrassingly
    * parallel: exactly the shape that survives 100 TB.
    *
    * Returns `(idCol, chunk_id, start, n_tokens, chunk_text)`.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunk=$chunkTokens")
    val stride = chunkTokens - overlap
    val n = size(col("__toks"))
    val starts = filter(
      sequence(lit(0), greatest(n - 1, lit(0)), lit(stride)),
      s => (s === 0) || (s + lit(overlap) < n))
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(starts).as("start"))
      .select(col(idCol),
        (col("start").cast(LongType) / stride).cast(LongType).as("chunk_id"),
        col("start").cast(LongType).as("start"),
        least(lit(chunkTokens), size(col("__toks")) - col("start"))
          .cast(LongType).as("n_tokens"),
        array_join(slice(col("__toks"), col("start") + 1, lit(chunkTokens)),
          " ").as("chunk_text"))
  }

  /** Per-column data profile — the pipeline health check run before and
    * after every corpus transformation (row/null/distinct counts, lexical
    * min/max): one row per column of the input schema.
    *
    * Shape: ONE aggregation pass; the per-column stats come back as a
    * single wide row of structs that explodes into rows driver-free. The
    * exact distinct counts expand the scan #columns-fold (Spark's
    * multi-distinct Expand) — viable through the shuffle at any width;
    * [[profileApprox]] swaps them for one-pass HLL sketches (no Expand)
    * when exactness stops mattering at 100 TB.
    */
  def profile(df: DataFrame): DataFrame =
    profileWith(df, c => countDistinct(c))

  /** [[profile]] with `approx_count_distinct` (HLL++, rsd): single pass,
    * no Expand — distinct estimates within the rsd contract (spec-gated
    * against [[profile]], the same gating as CardinalitySpec).
    */
  def profileApprox(df: DataFrame, rsd: Double = 0.02): DataFrame =
    profileWith(df, c => approx_count_distinct(c, rsd))

  private def profileWith(df: DataFrame,
      distinctAgg: Column => Column): DataFrame = {
    val stats = df.schema.fields.zipWithIndex.map { case (f, i) =>
      val c = col(f.name)
      struct(lit(f.name).as("col_name"),
        count(lit(1)).cast(LongType).as("n_rows"),
        coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L))
          .cast(LongType).as("n_nulls"),
        distinctAgg(c).cast(LongType).as("n_distinct"),
        min(c).cast("string").as("min_val"),
        max(c).cast("string").as("max_val")).as(s"s$i")
    }
    df.agg(stats.head, stats.tail: _*)
      .select(explode(array(df.schema.fields.indices
        .map(i => col(s"s$i")): _*)).as("s"))
      .select(col("s.*"))
  }

  /** Pairwise Pearson correlation with EXACT evidence: for every column
    * pair, the six sufficient statistics (n, Σa, Σb, Σab, Σa², Σb²) are
    * decimal-exact (≤4-decimal inputs ⇒ products exact at scale 8, sums
    * order-independent), cast to double only at the output edge; `corr`
    * is then derived from those doubles with a FIXED association
    * `(n·Σab − Σa·Σb) / (√(n·Σa²−Σa²ᵥ) · √(n·Σb²−Σb²ᵥ))` — identical
    * bit-exact inputs + exactly-rounded IEEE ops ⇒ identical doubles in
    * any engine, so even the float is oracle-checkable.
    *
    * ONE aggregation pass for ALL pairs (struct-per-pair, map-side
    * partial) — the profiling sweep stays a single corpus scan no matter
    * how many column pairs are requested. Nulls: callers pre-filter
    * (a null would desync `n` from the sums).
    */
  def correlationPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationPairs: need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def d4(c: String) = col(c).cast(org.apache.spark.sql.types.DecimalType(18, 4))
    def sq(a: String, b: String) =
      sum((d4(a) * d4(b)).cast(org.apache.spark.sql.types.DecimalType(38, 8)))
    val aggs = pairs.zipWithIndex.map { case ((a, b), idx) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        count(lit(1)).cast(LongType).as("n"),
        sum(d4(a)).cast("double").as("sum_a"),
        sum(d4(b)).cast("double").as("sum_b"),
        sq(a, b).cast("double").as("sum_ab"),
        sq(a, a).cast("double").as("sum_aa"),
        sq(b, b).cast("double").as("sum_bb")).as(s"p$idx")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.indices.map(i => col(s"p$i")): _*)).as("p"))
      .select(col("p.*"))
      .withColumn("corr",
        (col("n") * col("sum_ab") - col("sum_a") * col("sum_b")) /
          (sqrt(col("n") * col("sum_aa") - col("sum_a") * col("sum_a")) *
            sqrt(col("n") * col("sum_bb") - col("sum_b") * col("sum_b"))))
  }

  /** Greedy max-coverage subset selection — the diversity-first coreset
    * picker ("choose k docs that together cover the most distinct
    * n-grams"): each round scores every unselected document by how many
    * NOT-YET-COVERED shingles it would add, takes the argmax
    * (ties → smallest id), and folds the winner's shingles into the
    * covered set. The classic greedy (1−1/e) approximation to max
    * coverage, fully deterministic, so a round-unrolled relational
    * oracle replays every pick.
    *
    * Each round is one anti-join against the covered set + one count
    * aggregation over the standing (id, shingle) table (built once,
    * localCheckpointed); driver state is ONE row per round (the winner).
    * O(k) passes — right for report-sized k. At corpus-scale k the same
    * marginal-gain loop runs over sketched coverage (KMV unions) with
    * lazy-greedy re-evaluation; this exact form is its oracle face.
    */
  def greedyCoverage(df: DataFrame, idCol: String, textCol: String, k: Int,
      shingleN: Int = 3): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1,100], got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val sh = df.select(col(idCol).cast(LongType).as("id"),
        explode(graft.functions.TextFunctions.wordShingles(col(textCol),
          shingleN)).as("sh"))
      .localCheckpoint(true)
    var covered = sh.select(col("sh")).limit(0).localCheckpoint(true)
    var picked = Vector.empty[(Long, Long, Long, Long)]
    var coveredTotal = 0L
    var selected = Set.empty[Long]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val cand = if (selected.isEmpty) sh
        else sh.filter(!col("id").isin(selected.toSeq: _*))
      val win = cand.join(covered, Seq("sh"), "left_anti")
        .groupBy("id").agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id"))
        .limit(1).collect()
      if (win.isEmpty) done = true // every remaining doc adds nothing
      else {
        val id = win(0).getLong(0)
        val gain = win(0).getLong(1)
        coveredTotal += gain
        covered = covered
          .union(sh.filter(col("id") === id).select("sh"))
          .distinct().localCheckpoint(true)
        picked :+= ((r.toLong, id, gain, coveredTotal))
        selected += id
        r += 1
      }
    }
    picked.toDF("sel_rank", "doc_id", "gain", "covered_total")
  }

  /** Agreement between two boolean gates (Cohen's κ) — the QA check on
    * the quality tier itself: two filters that agree no better than
    * chance are not two signals. One aggregation emits the exact
    * confusion counts; observed/chance agreement and κ are derived
    * doubles with a fixed IEEE association (exact integer operands →
    * the floats oracle-check bitwise).
    */
  def agreementStats(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.agg(
      count(lit(1)).cast(LongType).as("n"),
      sum(when(col(aCol) && col(bCol), 1L).otherwise(0L)).as("n11"),
      sum(when(col(aCol) && !col(bCol), 1L).otherwise(0L)).as("n10"),
      sum(when(!col(aCol) && col(bCol), 1L).otherwise(0L)).as("n01"),
      sum(when(!col(aCol) && !col(bCol), 1L).otherwise(0L)).as("n00"))
    .withColumn("po", (col("n11") + col("n00")) / col("n"))
    .withColumn("pe",
      ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
        (col("n00") + col("n01")) * (col("n00") + col("n10"))) /
        (col("n") * col("n")))
    .withColumn("kappa", (col("po") - col("pe")) / (lit(1.0) - col("pe")))

  /** Per-group ordinary-least-squares trend — the drift monitor a corpus
    * pipeline runs over per-source daily volumes/quality scores ("is
    * src7 shrinking?"). Same exact-evidence discipline as
    * [[correlationPairs]]: the sufficient statistics (n, Σx, Σy, Σxy,
    * Σx²) are decimal-exact per group in ONE map-side-combined pass;
    * slope `(n·Σxy − Σx·Σy)/(n·Σx² − Σx·Σx)` and intercept
    * `(Σy − slope·Σx)/n` are derived from the edge doubles with a fixed
    * IEEE association, so both floats oracle-check bitwise.
    */
  def regressionByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    def d4(c: String) = col(c).cast(org.apache.spark.sql.types.DecimalType(18, 4))
    def sq(a: String, b: String) =
      sum((d4(a) * d4(b)).cast(org.apache.spark.sql.types.DecimalType(38, 8)))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(d4(xCol)).cast("double").as("sum_x"),
        sum(d4(yCol)).cast("double").as("sum_y"),
        sq(xCol, yCol).cast("double").as("sum_xy"),
        sq(xCol, xCol).cast("double").as("sum_xx"))
      .withColumn("slope",
        (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")) /
          (col("n") * col("sum_xx") - col("sum_x") * col("sum_x")))
      .withColumn("intercept",
        (col("sum_y") - col("slope") * col("sum_x")) / col("n"))
  }

  /** Robust per-group outlier flagging by median absolute deviation —
    * the length/score filter a curation pipeline prefers over mean±σ
    * (one giant document would drag a mean; it cannot drag a median).
    *
    * Every quantity stays an EXACT decimal via the doubled-median trick
    * (no division anywhere): `med2 = 2·median` is the sum of the one or
    * two rank-selected middle values times `(3 − #selected)`;
    * `dev2 = |2x − med2| = 2·deviation`; `mad4 = 2·median(dev2) = 4·MAD`;
    * and the flag compares `2·dev2 > k·mad4 ⟺ |x − med| > k·MAD`. Both
    * engines replay the integer/decimal arithmetic bit-for-bit; doubles
    * appear only at the output edge.
    *
    * Exact rank-selected medians cost one window sort per pass (two
    * passes). That is the oracle face: at 100 TB the same flag runs off
    * `approx_percentile` quantiles instead (the library's approx paths
    * are spec-gated against exact forms in QuantileSpec) — tie-order
    * inside the sort is irrelevant because rank selection over a sorted
    * MULTISET picks the same values regardless of how equals are
    * ordered.
    */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
      valCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def doubledMedian(in: DataFrame, c: String, out: String): DataFrame =
      in.withColumn("__rn", row_number().over(
          Window.partitionBy(groupCol).orderBy(col(c))))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
        .filter(col("__rn") === expr("(__n + 1) div 2") ||
          col("__rn") === expr("(__n + 2) div 2"))
        .groupBy(col(groupCol))
        .agg((sum(col(c)) * (lit(3) - count(lit(1)))).as(out))
    val base = df.select(col(groupCol), col(idCol),
      col(valCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
        .as("__x"))
    val d = base.join(doubledMedian(base, "__x", "med2"), Seq(groupCol))
      .withColumn("__dev2", abs(lit(2) * col("__x") - col("med2")))
      .localCheckpoint(false) // feeds the second median AND the output
    d.join(doubledMedian(d, "__dev2", "mad4"), Seq(groupCol))
      .select(col(groupCol), col(idCol),
        col("__x").cast("double").as("val"),
        col("med2").cast("double").as("med2"),
        col("__dev2").cast("double").as("dev2"),
        col("mad4").cast("double").as("mad4"),
        (lit(2) * col("__dev2") > lit(k) * col("mad4")).as("is_outlier"))
  }

  /** Per-group Gini concentration of a non-negative integer measure —
    * "is this source's size (or length, or token mass) dominated by a
    * few items?", the balance check a mixture designer runs beside
    * [[Stratified.allocate]]. Exact-integer evidence: with the group's
    * values sorted ascending (rank r, ties interchangeable — equal
    * values contribute identically whichever rank they take),
    * {{{
    *   gini_num = 2·Σ r·x_r − (n+1)·Σ x,   gini_den = n·Σ x,
    *   gini     = gini_num / gini_den      (ONE exact IEEE division)
    * }}}
    * 0 = perfectly even, → 1 = one item holds everything. One window
    * rank + one map-side-combined aggregation per group.
    *
    * Output: `(group, n_items, sum_val, gini_num, gini_den, gini)`.
    */
  def giniByGroup(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("group"),
        col(valCol).cast(LongType).as("__x"))
      .filter(col("__x").isNotNull && col("__x") >= 0L)
    base
      .withColumn("__r", row_number().over(
        Window.partitionBy("group").orderBy(col("__x"))))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_items"), sum(col("__x")).as("sum_val"),
        sum(col("__r") * col("__x")).as("__rx"))
      .select(col("group"), col("n_items"), col("sum_val"),
        (lit(2L) * col("__rx") - (col("n_items") + 1L) * col("sum_val"))
          .as("gini_num"),
        (col("n_items") * col("sum_val")).as("gini_den"),
        when(col("sum_val") === 0L, lit(0.0))
          .otherwise(
            (lit(2L) * col("__rx") - (col("n_items") + 1L) * col("sum_val"))
              .cast(org.apache.spark.sql.types.DoubleType) /
              (col("n_items") * col("sum_val"))
                .cast(org.apache.spark.sql.types.DoubleType))
          .as("gini"))
  }

  /** Quantile normalization of a per-group score onto the GLOBAL
    * distribution — the cross-domain calibration step before a single
    * threshold is applied to quality scores from differently-scaled
    * sources (a 0.9 from a lenient scorer and a 0.6 from a harsh one
    * land on comparable global quantiles).
    *
    * Each row's within-group percentile maps to the global value at
    * the same percentile. All arithmetic is integer-exact: with
    * within-group rank r of n (ties broken by `idCol`, so both engines
    * rank identically — equal values map to equal targets anyway) and
    * N global rows, the target global rank is round-half-up of
    * `1 + (r−1)(N−1)/(n−1)` computed as
    * `1 + (2(r−1)(N−1) + (n−1)) div (2(n−1))`; a singleton group maps
    * to the global median rank `1 + (N−1) div 2`.
    *
    * Shuffle shape: one window per group for the source ranks; the
    * GLOBAL rank side goes through [[prefixBefore]]'s two-phase prefix
    * sum (bucket by approximate quantiles, tiny per-bucket totals to
    * the driver, broadcast offsets back) — the same machinery as
    * [[globalOrderIndex]], because `row_number() OVER (ORDER BY val)`
    * is a single-partition sort at 100 TB; then one join on the
    * integer target rank.
    *
    * Output: `(id, group, val, src_rank, n_group, target_rank,
    * norm_val)`.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
      valCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(groupCol).as("group"),
        col(valCol).cast(LongType).as("val"))
      .filter(col("val").isNotNull)
    val ranked = base
      .withColumn("src_rank", row_number().over(
        Window.partitionBy("group").orderBy(col("val"), col("id"))))
      .withColumn("n_group",
        count(lit(1)).over(Window.partitionBy("group")))
    // two-phase global rank; the id tiebreak only disambiguates equal
    // values, whose target values are identical anyway
    val globalSorted = prefixBefore(
        base.select(col("id"), col("val").as("norm_val")),
        "norm_val", lit(1L), "__idx", tiebreak = Some("id"))
      .select((col("__idx") + 1L).as("target_rank"), col("norm_val"))
    val nTotal = base.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(nTotal))
      // `div`, not `/`: Spark's `/` is true division even on longs
      .withColumn("target_rank",
        when(col("n_group") === 1L,
          expr("1L + (n_total - 1L) div 2L"))
          .otherwise(expr(
            "1L + (2L * (CAST(src_rank AS BIGINT) - 1L) * (n_total - 1L)" +
              " + (n_group - 1L)) div (2L * (n_group - 1L))")))
      .join(globalSorted.select(col("target_rank"), col("norm_val")),
        Seq("target_rank"))
      .select(col("id"), col("group"), col("val"),
        col("src_rank"), col("n_group"), col("target_rank"),
        col("norm_val"))
  }

  /** Per-group trimmed mean of a ≤4-decimal measure: drop the lowest
    * and highest `⌊n·trimPpm/1e6⌋` values (integer-exact cut points,
    * value-ties broken by rank so both engines cut identically — equal
    * values are interchangeable anyway), exact DECIMAL sum over the
    * kept middle, ONE division at the edge. The robust location
    * estimate that survives the corrupted-length outliers
    * [[madOutliers]] flags.
    *
    * Output: `(group, n_items, n_kept, trimmed_mean)`.
    */
  def trimmedMeanByGroup(df: DataFrame, groupCol: String, valCol: String,
      trimPpm: Long = 100000L): DataFrame = {
    require(trimPpm >= 0L && trimPpm < 500000L,
      s"trimPpm must be in [0, 500000), got $trimPpm")
    val base = df.select(col(groupCol).as("group"),
        col(valCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .as("__x"))
      .filter(col("__x").isNotNull)
    base
      .withColumn("__r", row_number().over(
        Window.partitionBy("group").orderBy(col("__x"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("group")))
      .withColumn("__cut", expr(s"(__n * ${trimPpm}L) div 1000000L"))
      .filter(col("__r") > col("__cut") && col("__r") <= col("__n") - col("__cut"))
      .groupBy(col("group"))
      .agg(max(col("__n")).as("n_items"), count(lit(1)).as("n_kept"),
        (sum(col("__x")).cast(org.apache.spark.sql.types.DoubleType) /
          count(lit(1)).cast(org.apache.spark.sql.types.DoubleType))
          .as("trimmed_mean"))
  }

  /** Per-stage attrition ledger for a staged curation pipeline — the
    * "datasheet" block every production curation run publishes beside
    * its output (r13 verdict #3). Stages are (name, keep-predicate)
    * pairs evaluated SEQUENTIALLY: a document dropped at stage k is not
    * offered to stage k+1, matching how the composed pipeline
    * (`q_corpus_prep`) actually filters. All flags reduce in ONE pass:
    * each doc maps to its first-failing stage index, a tiny
    * (#stages + 1)-key aggregation counts them (map-side partials — the
    * only corpus-wide work), and the cumulative ledger unrolls over the
    * #stages-row result, so the window's single partition holds stage
    * COUNT rows, never corpus rows, at any scale.
    *
    * Null predicates count as FAIL (a gate that cannot evaluate a doc
    * must not silently pass it).
    *
    * Output: `(stage_id, stage, n_in, n_kept, n_dropped)` with
    * `n_kept(k) = n_in(k+1)` and `n_in(0)` = input row count.
    */
  def attritionReport(df: DataFrame,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "attritionReport needs at least one stage")
    require(stages.map(_._1).distinct.size == stages.size,
      "stage names must be unique")
    val n = stages.size
    // first failing stage index; n = survived every stage
    val firstFail = stages.zipWithIndex.foldRight(
      lit(n): Column) { case (((_, pred), i), acc) =>
      when(!coalesce(pred, lit(false)), lit(i)).otherwise(acc)
    }
    val drops = df.select(firstFail.as("__ff"))
      .groupBy("__ff").agg(count(lit(1)).as("__n"))
    val total = drops.agg(
      coalesce(sum(col("__n")), lit(0L)).as("__total"))
    val spark = df.sparkSession
    import spark.implicits._
    val stageDf = stages.map(_._1).zipWithIndex
      .map { case (name, i) => (i.toLong, name) }
      .toDF("stage_id", "stage")
    stageDf
      .join(drops.select(col("__ff").cast(LongType).as("stage_id"),
        col("__n")), Seq("stage_id"), "left")
      .na.fill(0L, Seq("__n"))
      .crossJoin(broadcast(total))
      .withColumn("__cum_prev", coalesce(
        sum(col("__n")).over(Window.orderBy("stage_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("stage_id"), col("stage"),
        (col("__total") - col("__cum_prev")).as("n_in"),
        (col("__total") - col("__cum_prev") - col("__n")).as("n_kept"),
        col("__n").as("n_dropped"))
  }
}
