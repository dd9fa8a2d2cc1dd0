package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document quality classification — the fastText-style filter step of a
  * production LLM data pipeline (GPT-3 / LLaMA / CCNet all gate web text
  * with a linear classifier over bag-of-ngram features trained "reference
  * corpus vs raw crawl").
  *
  * Two models, matching how the pipelines actually deploy them:
  *
  *   - '''Naive Bayes log-odds''' ([[classCounts]] / [[nbEvidence]] /
  *     [[nbScore]]): closed-form — the model IS a count table, training is
  *     one aggregation pass. The integer evidence (per-doc class-count
  *     sums, OOV counts) is engine-exact and oracle-checked
  *     (`q_quality_nb`); the log-space score is spec-gated.
  *   - '''Logistic regression over hashed features''' ([[trainLogistic]] /
  *     [[scoreLogistic]]): the hashing trick bounds the feature space to
  *     `dim` regardless of corpus vocabulary, full-batch gradient descent
  *     runs as relational aggregations whose sums go through
  *     DECIMAL(38,18) — exact and order-independent, so training is
  *     bitwise-deterministic under any partitioning (spec-pinned). The
  *     scored output is golden-pinned (`q_quality_logistic`).
  *
  * Scale shape for 100 TB: features are one explode + one (id, fid)
  * count agg; each training epoch is one broadcast join (weights are
  * ≤ dim rows — a 2^18-dim model is 2 MB), one shuffle on the doc id for
  * residuals, and one fid-keyed agg whose output is bounded by `dim`;
  * the only collects are the ≤ dim-row gradient and the feature-id set,
  * both bounded by construction. At 100 TB one trains on a sampled
  * slice (a classifier needs ~1M docs, not the corpus) and SCORES the
  * full corpus — scoring is explode → broadcast join → per-doc agg,
  * shuffle of one (id, margin) row per document.
  *
  * Tokenization matches [[LanguageModel]] / [[CorpusOps.vocabulary]]
  * (lowercase alpha runs), so oracle SQL mirrors it exactly.
  */
object QualityClassifier {

  private def toks(textCol: String): Column =
    filter(split(lower(col(textCol)), "[^a-z]+"), t => t =!= lit(""))

  private def bigramsOf(t: Column): Column =
    filter(
      zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      g => g.isNotNull)

  // ------------------------------------------------------------------
  // Naive Bayes
  // ------------------------------------------------------------------

  /** Per-token class counts — the whole NB model in one aggregation pass:
    * (token, c_pos, c_neg), occurrence counts within the positive /
    * negative class. `labelCol` must be boolean.
    */
  def classCounts(labeled: DataFrame, textCol: String,
      labelCol: String): DataFrame =
    labeled
      .select(col(labelCol).cast(BooleanType).as("__y"),
        explode(toks(textCol)).as("token"))
      .groupBy("token")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("c_neg"))

  /** Engine-exact classification evidence per document: for each token
    * occurrence, how often the training corpus saw it in each class.
    *
    *   - `n_tokens`, `oov_tokens` — counts;
    *   - `pos_evidence` / `neg_evidence` — Σ over occurrences of the
    *     token's class count (exact longs);
    *   - `pos_share` — pos_evidence / (pos_evidence + neg_evidence), one
    *     division of exact longs (null when the doc is all-OOV).
    *
    * All columns compare bitwise across engines (the oracle for
    * `q_quality_nb`); the log-space score lives in [[nbScore]]. Documents
    * with no alpha tokens emit (0, 0, 0, 0, null).
    */
  def nbEvidence(docs: DataFrame, idCol: String, textCol: String,
      counts: DataFrame): DataFrame = {
    val stream = docs.select(col(idCol).as("__id"),
      explode(toks(textCol)).as("token"))
      .join(broadcast(counts), Seq("token"), "left")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("c_pos").isNull, 1L).otherwise(0L)).as("oov_tokens"),
        coalesce(sum(col("c_pos")), lit(0L)).as("pos_evidence"),
        coalesce(sum(col("c_neg")), lit(0L)).as("neg_evidence"))
    docs.select(col(idCol).as("__id"))
      .join(stream, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("oov_tokens"), lit(0L)).as("oov_tokens"),
        coalesce(col("pos_evidence"), lit(0L)).as("pos_evidence"),
        coalesce(col("neg_evidence"), lit(0L)).as("neg_evidence"))
      .withColumn("pos_share",
        when(col("pos_evidence") + col("neg_evidence") > 0,
          col("pos_evidence").cast(DoubleType) /
            (col("pos_evidence") + col("neg_evidence")).cast(DoubleType)))
  }

  /** Multinomial NB log-odds score (Laplace-smoothed):
    * `score = ln(P(pos)/P(neg)) + Σ_tok ln((c_pos+1)/(N_pos+V)) −
    * ln((c_neg+1)/(N_neg+V))`; `prob > 0.5 ⇔ score > 0`. Floats are
    * order-summed → spec-gated ([[graft]] QualityClassifierSpec), not
    * oracle-hashed; the exact-integer face is [[nbEvidence]].
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
      counts: DataFrame, priorPos: Double = 0.5): DataFrame = {
    val totals = counts.agg(
      coalesce(sum(col("c_pos")), lit(0L)).as("np"),
      coalesce(sum(col("c_neg")), lit(0L)).as("nn"),
      count(lit(1)).as("v")).head
    val (np, nn, v) = (totals.getLong(0), totals.getLong(1), totals.getLong(2))
    require(np > 0 && nn > 0,
      "both classes need at least one training token")
    val w = broadcast(counts.select(col("token"),
      (log((coalesce(col("c_pos"), lit(0L)) + 1).cast(DoubleType) / (np + v))
        - log((coalesce(col("c_neg"), lit(0L)) + 1).cast(DoubleType) / (nn + v)))
        .as("__w")))
    val oovW = math.log(1.0 / (np + v)) - math.log(1.0 / (nn + v))
    val prior = math.log(priorPos) - math.log(1.0 - priorPos)
    val evidence = docs
      .select(col(idCol).as(idCol), explode(toks(textCol)).as("token"))
      .join(w, Seq("token"), "left")
      .groupBy(idCol)
      .agg((sum(coalesce(col("__w"), lit(oovW))) + prior).as("score"))
    // explode() emits no rows for a zero-token doc, which would silently
    // drop it from the output; left-join back and score such docs at the
    // bare prior log-odds (same contract as nbEvidence/scoreLogistic).
    docs.select(col(idCol))
      .join(evidence, Seq(idCol), "left")
      .withColumn("score", coalesce(col("score"), lit(prior)))
      .withColumn("predicted_pos", col("score") > 0)
  }

  // ------------------------------------------------------------------
  // Logistic regression over hashed features
  // ------------------------------------------------------------------

  /** Trained model: dense weights indexed by feature hash. */
  final case class LogisticModel(dim: Int, bias: Double,
      weights: Array[Double]) {
    require(weights.length == dim)
  }

  /** (id, fid, cnt) hashed bag-of-features stream: unigrams + bigrams,
    * `fid = xxhash64(gram) mod dim`. The hashing trick (Weinberger et al.
    * 2009) — feature space bounded by `dim` no matter the vocabulary, no
    * dictionary to build or ship.
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    featureStream(docs, idCol, textCol,
      g => pmod(xxhash64(g), lit(dim.toLong)).cast(IntegerType))
      .withColumn("cnt", col("cnt").cast(DoubleType))
  }

  /** (id, fid, cnt) stream under an arbitrary gram→feature-id column —
    * the shared explode/count plumbing behind [[hashedFeatures]] (xxhash)
    * and [[logisticEvidence]] (md5 bucket, which HAS an exact SQL twin).
    */
  private def featureStream(docs: DataFrame, idCol: String,
      textCol: String, fidOf: Column => Column): DataFrame = {
    val t = toks(textCol)
    docs.select(col(idCol).as("id"),
      explode(concat(t, bigramsOf(t))).as("__g"))
      .select(col("id"), fidOf(col("__g")).as("fid"))
      .groupBy("id", "fid")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Engine-exact evidence face of the logistic pipeline — the
    * `q_quality_nb` / `q_lm_kn` pattern applied to hashed-feature GD.
    *
    * The multi-epoch float weights cannot be recomputed in SQL, but the
    * FIRST full-batch gradient step from zero init is pure integer
    * arithmetic: `σ(0) = 1/2`, so the per-doc residual is `(1/2 − y) =
    * −s/2` with `s = 2y−1 ∈ {−1,+1}`, and after one step the margin of a
    * held-out doc q is `lr/(2n) · Σ_j G_j·x_qj` with the integer gradient
    * `G_j = Σ_train s_d·x_dj`. The positive scale `lr/(2n)` never flips a
    * sign, so the emitted UNSCALED margin `grad_margin = Σ_j G_j·x_qj`
    * carries the first-epoch prediction (`predicted_pos ⇔ grad_margin >
    * 0`) as an exact BIGINT the oracle checks bitwise — exercising the
    * whole hashing/explode/count/gradient-aggregate/score-join plumbing
    * the float path runs. Per doc: feature and gram counts, grams whose
    * feature saw no training mass (`oov_grams`), `grad_margin`,
    * `predicted_pos`; featureless docs emit zeros (prior = undecided).
    *
    * `fidOf` defaults to the production xxhash bucket; pass
    * [[md5FeatureId]] when an engine-independent oracle must replicate
    * the fid (xxhash64 has no SQL twin; the 52-bit md5 bucket does).
    *
    * Scale shape: the gradient table is ≤ dim rows (broadcast); the
    * corpus side is one explode + two id-keyed aggregations — identical
    * to scoring, no corpus-side shuffle beyond the per-doc agg.
    */
  def logisticEvidence(train: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, dim: Int,
      fidOf: Option[Column => Column] = None): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val f = fidOf.getOrElse(
      (g: Column) => pmod(xxhash64(g), lit(dim.toLong)).cast(IntegerType))
    val labels = train.select(col(idCol).as("id"),
      when(col(labelCol).cast(BooleanType), 1L).otherwise(-1L).as("__s"))
    // train is the bounded labeled slice (the classifier contract), so
    // its label table broadcasts — the gram stream never shuffles on id
    val grad = featureStream(train, idCol, textCol, f)
      .join(broadcast(labels), Seq("id"))
      .groupBy("fid")
      .agg(sum(col("__s") * col("cnt")).as("__g"))
    val ev = featureStream(docs, idCol, textCol, f)
      .join(broadcast(grad), Seq("fid"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_features"),
        sum(col("cnt")).as("n_grams"),
        sum(when(col("__g").isNull, col("cnt")).otherwise(0L))
          .as("oov_grams"),
        coalesce(sum(col("__g") * col("cnt")), lit(0L)).as("grad_margin"))
    docs.select(col(idCol).as("id"))
      .join(ev, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("oov_grams"), lit(0L)).as("oov_grams"),
        coalesce(col("grad_margin"), lit(0L)).as("grad_margin"))
      .withColumn("predicted_pos", col("grad_margin") > 0)
  }

  /** The oracle-expressible feature id: the 52-bit md5 bucket mod `dim`
    * (DuckDB: `('0x' || substr(md5(g), 20, 13))::BIGINT % dim`).
    */
  def md5FeatureId(dim: Int): Column => Column =
    g => (conv(substring(md5(to_binary(g, lit("utf-8"))), 20, 13), 16, 10)
      .cast(LongType) % lit(dim.toLong)).cast(IntegerType)

  /** Exact, order-independent sum of double products via DECIMAL(38,18):
    * products here are bounded (|w| and residuals are O(10), counts
    * O(doc length)), far inside the 10^20 integral capacity.
    */
  private def dsumExact(c: Column): Column =
    sum(c.cast(DecimalType(38, 18))).cast(DoubleType)

  /** Full-batch gradient descent, bitwise-deterministic: every cross-row
    * sum (margins, gradients) goes through DECIMAL(38,18) — exact, so no
    * partitioning or reduce-tree shape can move a ulp — and the driver
    * update is plain array arithmetic. `labelCol` boolean.
    *
    * The intercept rides as a synthetic feature (`fid = -1`, count 1 on
    * every doc), so one epoch is ONE action: broadcast-join the ≤dim-row
    * weight table against the (checkpointed) feature stream, aggregate
    * margins per doc, join labels, aggregate the gradient per fid,
    * collect — the bias gradient falls out as the `-1` row instead of
    * costing a second job. Collects are bounded by `dim + 1`.
    */
  def trainLogistic(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int = 1 << 15, epochs: Int = 10,
      lr: Double = 0.5, l2: Double = 0.0): LogisticModel = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val base = labeled.select(col(idCol).as("id"),
      col(labelCol).cast(BooleanType).cast(DoubleType).as("y"))
    val feats = hashedFeatures(labeled, idCol, textCol, dim)
      .unionByName(base.select(col("id"), lit(-1).as("fid"),
        lit(1.0).as("cnt")))
      .join(base.select("id", "y"), Seq("id"))
      .localCheckpoint(true)
    val n = feats.filter(col("fid") === -1).count()
    require(n > 0, "empty training set")
    val fids = feats.select("fid").distinct().as[Int].collect().sorted
    val w = new Array[Double](dim)
    var b = 0.0
    for (_ <- 0 until epochs) {
      val wDF = fids.map(f => (f, if (f < 0) b else w(f))).toSeq
        .toDF("fid", "__w")
      val resid = feats.join(broadcast(wDF), Seq("fid"))
        .groupBy("id", "y")
        .agg(dsumExact(col("cnt") * col("__w")).as("__m"))
        .select(col("id"),
          (lit(1.0) / (lit(1.0) + exp(-col("__m"))) - col("y")).as("__r"))
      val grad = feats.join(resid, Seq("id"))
        .groupBy("fid")
        .agg(dsumExact(col("__r") * col("cnt")).as("g"))
        .as[(Int, Double)].collect()
      grad.foreach { case (f, g) =>
        if (f < 0) b -= lr * g / n
        else w(f) -= lr * (g / n + l2 * w(f))
      }
    }
    LogisticModel(dim, b, w)
  }

  /** Score documents under a trained model: (id, margin, prob).
    * Margins fold through the same exact decimal sum as training, so
    * scores are bitwise-deterministic under any partitioning — the
    * property that lets `q_quality_logistic` be golden-pinned. Docs with
    * no features score the bare bias.
    */
  def scoreLogistic(docs: DataFrame, idCol: String, textCol: String,
      model: LogisticModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDF = model.weights.toSeq.zipWithIndex
      .collect { case (wt, f) if wt != 0.0 => (f, wt) }
      .toDF("fid", "__w")
    val margins = hashedFeatures(docs, idCol, textCol, model.dim)
      .join(broadcast(wDF), Seq("fid"))
      .groupBy("id")
      .agg(dsumExact(col("cnt") * col("__w")).as("__m"))
    docs.select(col(idCol).as("id"))
      .join(margins, Seq("id"), "left")
      .select(col("id").as(idCol),
        (coalesce(col("__m"), lit(0.0)) + model.bias).as("margin"))
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
  }

  /** Persist a trained model as parquet: row 0 carries (dim, bias), the
    * rest the non-zero weights — train once on the curated slice, reload
    * in every scoring job (the classifier the pipeline ships is an
    * artifact, not a closure). Round-trip is exact: doubles pass through
    * untouched, so reloaded scores are bitwise-identical (spec-pinned).
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
      model: LogisticModel, path: String): Unit = {
    import spark.implicits._
    val rows = (-1, model.dim.toDouble) +: (0, model.bias) +:
      model.weights.toSeq.zipWithIndex
        .collect { case (wt, f) if wt != 0.0 => (f + 1, wt) }
    rows.toDF("k", "v").repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[saveModel]] artifact. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): LogisticModel = {
    import spark.implicits._
    val rows = spark.read.parquet(path).as[(Int, Double)].collect().toMap
    val dim = rows(-1).toInt
    val w = new Array[Double](dim)
    rows.foreach { case (k, v) => if (k > 0) w(k - 1) = v }
    LogisticModel(dim, rows(0), w)
  }

  /** Train-then-gate composition: keep documents the classifier scores
    * at or above `minProb` (the CCNet shape: train on "reference vs
    * crawl", drop the crawl-looking tail).
    */
  def qualityFilter(corpus: DataFrame, idCol: String, textCol: String,
      labeled: DataFrame, labelCol: String, minProb: Double = 0.5,
      dim: Int = 1 << 15, epochs: Int = 10, lr: Double = 0.5): DataFrame = {
    val model = trainLogistic(labeled, idCol, textCol, labelCol, dim,
      epochs, lr)
    corpus.join(
      scoreLogistic(corpus, idCol, textCol, model)
        .filter(col("prob") >= minProb).select(col(idCol)),
      Seq(idCol), "left_semi")
  }
}
