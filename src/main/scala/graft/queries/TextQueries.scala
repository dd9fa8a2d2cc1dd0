package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.queries.Q._

/** Oracle-checked queries for the text-analysis / dedup tier of the north
  * star (BASELINE.json): language ID, quality scoring, token counting,
  * fingerprinting, exact dedup, multimodal metadata — over `documents`.
  *
  * All computations that feed the hash compare are exact (integer or
  * decimal arithmetic, or divisions of exact integers), so Spark and the
  * DuckDB oracle agree bitwise.
  */
object TextQueries {

  /** Card-detection fixture: official Luhn-valid test numbers (spaced,
    * dashed, bare, 15-digit), a 16-digit non-card order id, an off-by-one
    * invalid, a phone (too short to be a candidate), and a 20-digit run
    * (no match: the regex requires a non-digit boundary after 13-19
    * digits, and backtracking cannot end inside the run).
    */
  private val CardDocs = Seq(
    (1L, "pay 4111 1111 1111 1111 or 5555-5555-5555-4444 now"),
    (2L, "order id 1234567890123456 shipped to 4012888888881881"),
    (3L, "amex 378282246310005 and bogus 4111111111111112"),
    (4L, "call 555-123-4567, no cards"),
    (5L, "long run 12345678901234567890 ignored"))

  val queries: Map[String, QueryFn] = Map(
    // token counting: whitespace + BPE-ish regex pre-tokenizer.
    "q_token_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        asLong(length(col("text"))).as("n_chars_actual"),
        asLong(tokenCountWs(col("text"))).as("n_tokens_ws"),
        asLong(tokenCountRegex(col("text"))).as("n_tokens_re"))
        .orderBy("doc_id")),

    // quality scoring: exact-integer-ratio features.
    "q_text_quality" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        asLong(length(col("text"))).as("len"),
        (aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast(DoubleType)
          / size(toks).cast(DoubleType)).as("mean_token_len"),
        (punctCount(col("text")).cast(DoubleType)
          / length(col("text")).cast(DoubleType)).as("punct_ratio"),
        (stopwordHits(col("text"), LangProfiles.head._2).cast(DoubleType)
          / size(toks).cast(DoubleType)).as("stopword_ratio"))
        .orderBy("doc_id")
    }),

    // language-ID heuristic: per-profile stopword scores + first-max-wins.
    "q_lang_id" -> ((s, dir) => {
      val scores = LangProfiles.map { case (lang, words) =>
        asLong(stopwordHits(col("text"), words)).as(s"s_$lang")
      }
      t(s, dir, "documents")
        .select((col("doc_id") +: scores :+
          langIdHeuristic(col("text")).as("predicted")): _*)
        .orderBy("doc_id")
    }),

    // language-ID evaluation against the labeled lang column: the
    // confusion matrix plus per-label recall (exact integral ppm) —
    // the accuracy report a curation run publishes with its lang gate.
    "q_langid_confusion" -> ((s, dir) => {
      val preds = t(s, dir, "documents")
        .select(col("lang"), langIdHeuristic(col("text")).as("predicted"))
      preds.groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_labeled", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang")))
        .select(col("lang"), col("predicted"), asLong(col("n")).as("n"),
          asLong(col("n_labeled")).as("n_labeled"),
          when(col("lang") === col("predicted"),
            expr("n * 1000000L div n_labeled")).as("recall_ppm"))
        .orderBy("lang", "predicted")
    }),

    // markup stripping (SEC filings embed HTML/SGML) + char-shingle
    // near-dup blocking unit for short texts.
    "q_text_clean" -> ((s, _) => {
      import s.implicits._
      s.createDataset(Seq(
        (1L, "<html><b>Annual  report</b> for <i>ACME</i>.</html>"),
        (2L, "plain text, no markup"),
        (3L, "<p>x</p>"),
        (4L, "ab")))
        .toDF("id", "raw")
        .select(col("id"),
          TextFunctions.stripMarkup(col("raw")).as("clean"),
          TextFunctions.charShingles(
            TextFunctions.stripMarkup(col("raw")), 4).as("shingles"))
        .select(col("id"), col("clean"),
          asLong(size(col("shingles"))).as("n_shingles"),
          try_element_at(col("shingles"), lit(1)).as("first_shingle"))
        .orderBy("id")
    }),

    // the composed training-data-prep flow a 100 TB user runs: exact
    // dedup (keep lowest id per content) → language gate → length +
    // stopword-ratio quality gates → per-doc features.
    "q_corpus_prep" -> ((s, dir) => {
      val deduped = graft.operators.Dedup.exactDedup(
        t(s, dir, "documents"), "doc_id", "text")
      val toks = TextFunctions.tokens(col("text"))
      deduped
        .withColumn("n_tokens", size(toks).cast(LongType))
        .withColumn("stopword_ratio",
          stopwordHits(col("text"), LangProfiles.head._2).cast(DoubleType)
            / size(toks).cast(DoubleType))
        .withColumn("lang", langIdHeuristic(col("text")))
        .filter(col("lang") === "en" && col("n_tokens") >= 30 &&
          col("stopword_ratio") >= 0.02)
        .select(col("doc_id"), col("n_tokens"), col("stopword_ratio"))
        .orderBy("doc_id")
    }),

    // per-stage attrition ledger (r13 verdict #3): the datasheet every
    // production curation run publishes — kept/dropped exact counts for
    // the q_corpus_prep stage sequence (exact-dedup → language →
    // quality → repetition), flags computed in one pass (repetition via
    // the doc-local WordRepStats kernel, materialized once), reduced by
    // a (#stages+1)-key aggregation; the cumulative unroll runs over
    // #stages rows, never corpus rows.
    "q_attrition_ledger" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(
        md5(to_binary(col("text"), lit("utf-8"))))
      val flagged = t(s, dir, "documents")
        .withColumn("__rep",
          graft.operators.CorpusOps.wordRepStruct(col("text")))
        .withColumn("__keeper",
          col("doc_id") === min(col("doc_id")).over(w))
        .withColumn("__n_tokens", size(toks).cast(LongType))
        .withColumn("__sw_ratio",
          stopwordHits(col("text"), LangProfiles.head._2).cast(DoubleType)
            / size(toks).cast(DoubleType))
        .withColumn("__en", langIdHeuristic(col("text")) === "en")
        .withColumn("__rep_gate",
          when(col("__rep.n_bigrams") > 0L,
            col("__rep.top_bigram").cast(DoubleType) /
              col("__rep.n_bigrams").cast(DoubleType))
            .otherwise(lit(0.0)) <= 0.18)
      graft.operators.CorpusOps.attritionReport(flagged, Seq(
        ("exact_dedup", col("__keeper")),
        ("language", col("__en")),
        ("quality", col("__n_tokens") >= 30 && col("__sw_ratio") >= 0.02),
        ("repetition", col("__rep_gate"))))
        .orderBy("stage_id")
    }),

    // order-sensitive document fingerprint (mod-prime rolling sum).
    "q_doc_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        docFingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")),

    // exact dedup: hash-groupBy on content, keep lowest doc_id.
    "q_dedup_exact" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("content_hash"))
        .agg(asLong(min(col("doc_id"))).as("keeper_id"),
          asLong(count(lit(1))).as("n_copies"))
        .select(col("keeper_id"), col("n_copies"), col("content_hash"))
        .orderBy("keeper_id")),

    // multimodal columns: opaque binary + typed metadata. The image
    // modality has a REAL javax.imageio codec path (q_multimodal_decode
    // below); decodeAndFeaturize now decodes image bytes for real too,
    // stubbing only codecs the JVM lacks (exotic audio) behind the
    // labeled byte-histogram fallback.
    "q_multimodal_meta" -> ((s, dir) => {
      val bin = to_binary(col("text"), lit("utf-8"))
      t(s, dir, "documents").select(
        col("doc_id"),
        asLong(length(bin)).as("n_bytes"),
        md5(bin).as("digest"),
        asLong(floor(length(bin) / lit(1024)) + 1).as("n_chunks"))
        .orderBy("doc_id")
    }),

    // frame sampling (video-frame shape): one row in → N fixed-size
    // chunks out, validated per frame against SQL substring arithmetic.
    "q_multimodal_frames" -> ((s, dir) => {
      val media = graft.operators.Multimodal.attachBinary(
        t(s, dir, "documents").filter(col("doc_id") < 50), "doc_id", "text")
      graft.operators.Multimodal.frameSample(media, chunkBytes = 64)
        .select(col("id").as("doc_id"),
          asLong(col("frame_id")).as("frame_id"),
          asLong(length(col("frame"))).as("frame_len"),
          col("frame").cast(StringType).as("frame_text"))
        .orderBy("doc_id", "frame_id")
    }),

    // REAL image decode: a PNG per doc (pixels = ascii of md5 hex) is
    // encoded AND decoded through javax.imageio; the oracle recomputes
    // the same stats straight from md5(text) in SQL, so a hash match
    // proves the lossless codec round-trip — not a pin.
    "q_multimodal_decode" -> ((s, dir) => {
      val imgs = graft.operators.Multimodal.fingerprintImage(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text")
      graft.operators.Multimodal.imagePixelStats(imgs)
        .select(col("id").as("doc_id"), col("decoded"),
          asLong(col("width")).as("width"),
          asLong(col("height")).as("height"),
          col("n_pixels"), col("sum_intensity"),
          col("min_intensity"), col("max_intensity"))
        .orderBy("doc_id")
    }),

    // REAL audio decode: a RIFF/WAVE file per doc (16-bit PCM samples =
    // ascii of md5 hex) encoded AND parsed through javax.sound.sampled;
    // PCM is lossless so the oracle recomputes the stats from md5(text).
    "q_multimodal_audio" -> ((s, dir) => {
      val wavs = graft.operators.Multimodal.fingerprintWav(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text")
      graft.operators.Multimodal.audioSampleStats(wavs)
        .select(col("id").as("doc_id"), col("decoded"),
          asLong(col("sample_rate")).as("sample_rate"),
          asLong(col("channels")).as("channels"),
          col("n_samples"), col("sum_sample"),
          col("min_sample"), col("max_sample"))
        .orderBy("doc_id")
    }),

    // REAL image resize: decode the 8×4 fingerprint PNG, nearest-
    // neighbor resample to 4×2 (dest (x,y) ← src (2x,2y)), re-encode,
    // decode AGAIN and emit pixel stats — the oracle predicts exactly
    // which md5 hex positions survive the resample.
    "q_multimodal_resize" -> ((s, dir) => {
      val imgs = graft.operators.Multimodal.fingerprintImage(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text")
      graft.operators.Multimodal.imagePixelStats(
        graft.operators.Multimodal.resizeImages(imgs, dstW = 4, dstH = 2))
        .select(col("id").as("doc_id"), col("decoded"),
          asLong(col("width")).as("width"),
          asLong(col("height")).as("height"),
          col("n_pixels"), col("sum_intensity"),
          col("min_intensity"), col("max_intensity"))
        .orderBy("doc_id")
    }),

    // video: container demux (PNG chunk walk to IEND) + per-frame REAL
    // decode; frame 0 derives from md5(text), frame 1 from
    // md5(md5(text)) — the oracle predicts every frame's pixels.
    "q_multimodal_video" -> ((s, dir) => {
      val vids = graft.operators.Multimodal.fingerprintVideo(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text")
      graft.operators.Multimodal.videoFrameStats(vids)
        .select(col("id").as("doc_id"), col("frame_id"),
          asLong(col("width")).as("width"),
          asLong(col("height")).as("height"),
          col("n_pixels"), col("sum_intensity"),
          col("min_intensity"), col("max_intensity"))
        .orderBy("doc_id", "frame_id")
    }),

    // REAL JPEG decode: the md5-fingerprint grayscale through ImageIO's
    // JPEG writer at quality 1.0 and back. Lossy codec → the oracle
    // checks exact geometry + the exact source-pixel sum (md5-derivable
    // in SQL) + fixed decode-error bounds (measured ≤1/pixel, ≤5 total
    // on this codec; gated at ≤2 / ≤16 — sum_err/max_pix_err of -1,
    // i.e. decode failure, fails the gate).
    "q_multimodal_jpeg" -> ((s, dir) =>
      graft.operators.Multimodal.jpegRoundTrip(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text")
        .select(col("id").as("doc_id"), col("decoded"),
          asLong(col("width")).as("width"),
          asLong(col("height")).as("height"),
          col("n_pixels"), col("src_sum"),
          (col("max_pix_err") >= 0 && col("max_pix_err") <= 2)
            .as("pix_err_ok"),
          (col("sum_err") >= 0 && col("sum_err") <= 16).as("sum_err_ok"))
        .orderBy("doc_id")),

    // REAL video: two JPEG frames muxed into a hand-written MJPEG AVI
    // (RIFF), demuxed back by walking the chunk tree, each frame decoded
    // through the real JPEG codec — the full container+codec path with
    // zero new dependencies. Per-frame certificate under the
    // q_multimodal_jpeg bounded-loss contract (same codec-calibration
    // note applies).
    "q_multimodal_video_real" -> ((s, dir) =>
      graft.operators.Multimodal.aviRoundTrip(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text")
        .select(col("id").as("doc_id"), col("frame_id"), col("decoded"),
          asLong(col("width")).as("width"),
          asLong(col("height")).as("height"),
          col("n_pixels"), col("src_sum"),
          (col("max_pix_err") >= 0 && col("max_pix_err") <= 2)
            .as("pix_err_ok"),
          (col("sum_err") >= 0 && col("sum_err") <= 16).as("sum_err_ok"))
        .orderBy("doc_id", "frame_id")),

    // audio feature extraction: windowed RMS-energy numerators over the
    // DECODED PCM frames — exact integers end-to-end, so the whole
    // decode→window→feature path is oracle-checked, not pinned.
    "q_multimodal_energy" -> ((s, dir) => {
      val wavs = graft.operators.Multimodal.fingerprintWav(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text")
      graft.operators.Multimodal.audioEnergyWindows(wavs, windowSamples = 8)
        .select(col("id").as("doc_id"), col("window_id"),
          col("n_samples"), col("sum_sq"), col("peak"))
        .orderBy("doc_id", "window_id")
    }),

    // image perceptual-hash NEAR-DUP (r13 verdict #2, the missing
    // modality operator): real PNG decode → 8×8 nearest-neighbor
    // thumbnail → integer-exact aHash (64·v > Σv) → Hamming-banded
    // candidates → exact verify. Near-dups are PLANTED by perturbing
    // one md5 hex position per doc (fingerprintImageHex); the oracle
    // recomputes the same thumbnail/threshold/Hamming arithmetic from
    // md5(text) and brute-forces ALL pairs — a hash match certifies
    // both the real decode AND that banding lost no pair at the bound
    // (pigeonhole: 4 bands of 16 bits are lossless at hamming ≤ 3).
    "q_image_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          md5(to_binary(col("text"), lit("utf-8"))).as("hex"))
      val hexes = docs.select((col("doc_id") * 2).as("id"), col("hex"))
        .unionAll(docs.select((col("doc_id") * 2 + 1).as("id"),
          concat(lit("0"), expr("substring(hex, 2)")).as("hex")))
      val media = graft.operators.Multimodal.fingerprintImageHex(
        hexes, "id", "hex")
      graft.operators.ImageDedup.nearDupPairs(media, hammingMax = 3)
        .select(col("id_a"), col("id_b"), asLong(col("hamming")).as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // the dHash (gradient-sign) sketcher under the same banded
    // pipeline: 9×8 nearest-neighbor thumbnail, bit (y·8+x) =
    // t(x,y) > t(x+1,y) — brightness-invariant, the production
    // default for re-encoded/brightness-shifted near-dups. Oracle
    // recomputes the 9×8 resample (src x = (x·8)//9, y = y//2 over the
    // 8×4 md5 image) and brute-forces all pairs.
    "q_image_dedup_dhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          md5(to_binary(col("text"), lit("utf-8"))).as("hex"))
      val hexes = docs.select((col("doc_id") * 2).as("id"), col("hex"))
        .unionAll(docs.select((col("doc_id") * 2 + 1).as("id"),
          concat(lit("0"), expr("substring(hex, 2)")).as("hex")))
      val media = graft.operators.Multimodal.fingerprintImageHex(
        hexes, "id", "hex")
      graft.operators.ImageDedup.nearDupPairs(media, hammingMax = 3,
          sketcher = graft.operators.ImageDedup.dHashSketches)
        .select(col("id_a"), col("id_b"), asLong(col("hamming")).as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // audio near-dup: real WAV decode → 65 time anchors → temporal
    // delta-hash (bit j: a(j) > a(j+1)) → the same Hamming-banded
    // candidate join + exact verify as q_image_dedup. Near-dup clips
    // are planted by perturbing one hex position per doc (one PCM
    // sample changes), and the oracle recomputes anchors/bits/Hamming
    // from md5(text) and brute-forces all pairs — a hash match
    // certifies the real codec roundtrip AND lossless banding.
    "q_audio_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          md5(to_binary(col("text"), lit("utf-8"))).as("hex"))
      val hexes = docs.select((col("doc_id") * 2).as("id"), col("hex"))
        .unionAll(docs.select((col("doc_id") * 2 + 1).as("id"),
          concat(lit("0"), expr("substring(hex, 2)")).as("hex")))
      val media = graft.operators.Multimodal.fingerprintWavHex(
        hexes, "id", "hex")
      graft.operators.ImageDedup.nearDupPairs(media, hammingMax = 3,
          sketcher = graft.operators.ImageDedup.wavDeltaSketches)
        .select(col("id_a"), col("id_b"), asLong(col("hamming")).as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // video frame-level near-dup: demux each 2-frame concatenated-PNG
    // video (frame 0 ← md5(text), frame 1 ← md5∘md5) and run the same
    // sketch→band→verify pipeline over frames. Near-dup videos are
    // planted like q_image_dedup's: a perturbed variant per doc with
    // one hex position rewritten in BOTH frames, so each original
    // frame pairs with its perturbation at hamming ≤ 3.
    "q_video_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          md5(to_binary(col("text"), lit("utf-8"))).as("h0"))
        .withColumn("h1", md5(to_binary(col("h0"), lit("utf-8"))))
      val hexes = docs.select((col("doc_id") * 2).as("id"),
          col("h0"), col("h1"))
        .unionAll(docs.select((col("doc_id") * 2 + 1).as("id"),
          concat(lit("0"), expr("substring(h0, 2)")).as("h0"),
          concat(lit("0"), expr("substring(h1, 2)")).as("h1")))
      val vids = graft.operators.Multimodal.fingerprintVideoHex(
        hexes, "id", "h0", "h1")
      graft.operators.ImageDedup.videoFrameNearDupPairs(vids,
        hammingMax = 3)
        .select(col("id_a"), col("id_b"), asLong(col("hamming")).as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // CROSS-MODALITY curation composition (r14 verdict #7): the three
    // modality sketch families feed ONE curation pipeline instead of
    // coexisting — text exact dedup, audio delta-hash near-dup
    // (hamming ≤ 1), image aHash near-dup (hamming ≤ 3), then a fourth
    // CROSS-MODAL stage: the union of all three channels' pairs
    // resolves into merged families, where an entity can WIN every
    // single-channel arbitration yet lose the merged one when channels
    // bridge its cluster. Arbitration per cluster is keepBest's rule —
    // score desc (doc length), id asc — at member grain; the output is
    // the attritionReport ledger (first-failing-stage semantics).
    //
    // Four plant classes over docs < 200 (entities 2i / 2i+1), each
    // exercising its own stage — the construction AND the pipeline are
    // the shared operator ([[graft.operators.CrossModal]], r16): this
    // gate certifies both at oracle grain, CrossModalSoak runs the SAME
    // implementation at the media-dense tier. DuckDB replays every
    // channel from md5(text) (the q_image_dedup / q_audio_dedup
    // pixel/anchor CTEs), resolves clusters by recursive CC, applies
    // the same arbitration, and unrolls the ledger — one hash match
    // certifies the three sketch families COMPOSE.
    "q_corpus_prep_multimodal" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val ents = graft.operators.CrossModal.plantedEntities(docs)
        .localCheckpoint(true) // feeds 3 sketchers + scoring: scan once
      graft.operators.CrossModal.prepAttrition(ents)
        .select(asLong(col("stage_id")).as("stage_id"), col("stage"),
          asLong(col("n_in")).as("n_in"),
          asLong(col("n_kept")).as("n_kept"),
          asLong(col("n_dropped")).as("n_dropped"))
        .orderBy("stage_id")
    }),

    // deterministic content-hash train/val/test split — stable under
    // reruns, cluster resizing, and corpus growth (randomSplit is none
    // of those); exact integer buckets, shuffle-free.
    "q_split_assign" -> ((s, dir) =>
      graft.operators.CorpusOps.splitAssign(t(s, dir, "documents"),
        "doc_id", Seq(("train", 90), ("val", 5), ("test", 5)))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")),

    // token-budget shard packing: two-phase range-partitioned running
    // sum (no global-window single-partition sort), shard = tokens
    // before the doc DIV budget.
    "q_pack_shards" -> ((s, dir) =>
      graft.operators.CorpusOps.packShards(
        t(s, dir, "documents").select(col("doc_id"),
          asLong(tokenCountWs(col("text"))).as("n_tokens")),
        "doc_id", "n_tokens", budget = 5000L)
        .select(col("doc_id"), col("n_tokens"), col("shard_id"))
        .orderBy("doc_id")),

    // NEXT-FIT sequence packing: short docs share a fixed 256-token
    // training sequence instead of wasting it on padding; packing is a
    // per-bucket (128 order-contiguous docs) sorted integer fold, so
    // sequences never span buckets and the oracle replays the exact
    // same recurrence as a recursive CTE.
    "q_pack_sequences" -> ((s, dir) =>
      graft.operators.CorpusOps.packSequences(
        t(s, dir, "documents").select(col("doc_id"),
          asLong(tokenCountWs(col("text"))).as("n_tokens")),
        "doc_id", "n_tokens", seqLen = 256L, bucketDocs = 128L)
        .select(col("doc_id"), col("n_tokens"), col("bucket"), col("seq"),
          col("seq_offset"))
        .orderBy("doc_id")),

    // n-gram novelty vs the src0 reference slice: how much does each
    // non-src0 doc add over what the reference corpus has seen — exact
    // BIGINT distinct-gram counts, 8-byte hash membership probe in the
    // engine, one integral ppm division.
    "q_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.CorpusOps.noveltyScore(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"), "doc_id", "text")
        .select(col("doc_id"), col("n_grams"), col("n_known"),
          col("n_novel"), col("novelty_ppm"))
        .orderBy("doc_id")
    }),

    // incremental novelty: the src0 reference is INDEXED once (distinct
    // gram hashes + doc counts) and the src1 batch probes the index —
    // the daily-increment shape where the reference is never re-read;
    // the oracle scores the same batch against the reference directly,
    // so the gate proves index-probe ≡ direct.
    "q_novelty_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = graft.operators.CorpusOps.noveltyIndex(
        docs.filter(col("source") === "src0"), "doc_id", "text")
      graft.operators.CorpusOps.noveltyAgainstIndex(
        docs.filter(col("source") === "src1"), idx, "doc_id", "text")
        .select(col("doc_id"), col("n_grams"), col("n_known"),
          col("n_novel"), col("novelty_ppm"))
        .orderBy("doc_id")
    }),

    // the round-10 end-to-end curation capstone: exact-dup arbitration
    // keeping the LONGEST copy (struct-max, no window) → lexical
    // entropy/TTR gate (the RefinedWeb-style filters, thresholds that
    // bite: ~25-30% of docs fail) → curriculum training order over the
    // survivors. Every stage individually oracle-checked elsewhere;
    // this face proves the COMPOSITION end-to-end.
    "q_corpus_prep2" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val keepers = docs
        .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("__h"))
        .agg(max(struct(col("n_chars").as("s"),
          (-col("doc_id")).as("negid"))).as("b"))
        .select((-col("b.negid")).as("doc_id"))
      val kept = docs.join(keepers, Seq("doc_id"), "left_semi")
      val lex = graft.operators.Lexical.lexicalStats(kept, "doc_id", "text")
        .select(col("doc_id"), Q.ppb(col("entropy")).as("e_ppb"),
          expr("n_types * 1000000L div n_tokens").as("ttr_ppm"))
      val gated = kept.select(col("doc_id"), col("n_chars"))
        .join(lex, Seq("doc_id"))
        .filter(col("e_ppb") >= 2900000000L && col("ttr_ppm") >= 350000L)
      graft.operators.CorpusOps.curriculumOrder(gated, "doc_id",
        expr("n_chars div 50"), seed = "epoch1")
        .select(col("doc_id"), col("e_ppb"), col("ttr_ppm"),
          expr("n_chars div 50").as("bucket"), col("curriculum_rank"))
        .orderBy("doc_id")
    }),

    // per-source corpus card (the "datasheet" block a curation run
    // publishes): docs, exact-dup ppm, token/vocab totals, TTR,
    // tokens-per-doc, and source-level word-distribution entropy —
    // lexicalStats reused at source granularity plus ONE
    // (source, content-hash) pass for doc/dup counts; 2 corpus scans
    // total, all integers except the ppb entropy.
    "q_corpus_card" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Lexical.corpusCard(
        graft.operators.Lexical.wordCounts(docs, "source", "text"),
        graft.operators.Lexical.dupLedger(docs, "source", "text"))
        .select(col("group").as("source"),
          asLong(col("n_docs")).as("n_docs"),
          asLong(col("n_distinct")).as("n_distinct"),
          col("dup_ppm"), asLong(col("n_tokens")).as("n_tokens"),
          asLong(col("n_types")).as("n_types"), col("ttr_ppm"),
          col("tokens_per_doc"),
          Q.ppb(col("entropy")).as("entropy_ppb"))
        .orderBy("source")
    }),

    // lexical-entropy quality gate (RefinedWeb/Gopher "natural
    // language" filters): per doc, word-distribution Shannon entropy,
    // type-token ratio, and modal word frequency. Entropy folds c·ln c
    // in word-ascending order and quantizes to ppb; TTR is an exact
    // integral ppm.
    "q_lexical_entropy" -> ((s, dir) =>
      graft.operators.Lexical.lexicalStats(
        t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"),
          asLong(col("n_tokens")).as("n_tokens"),
          asLong(col("n_types")).as("n_types"),
          expr("n_types * 1000000L div n_tokens").as("ttr_ppm"),
          asLong(col("max_freq")).as("max_freq"),
          Q.ppb(col("entropy")).as("entropy_ppb"))
        .orderBy("doc_id")),

    // bigram/conditional entropy per source — the predictability/
    // templatedness gate: cond = H(bigram) − H(unigram) ≈ H(w2|w1);
    // boilerplate sources collapse toward 0. Gram-ascending folds, ppb
    // edge.
    "q_bigram_entropy" -> ((s, dir) =>
      graft.operators.Lexical.bigramEntropy(
        t(s, dir, "documents"), "source", "text")
        .select(col("group"),
          asLong(col("n_tokens")).as("n_tokens"),
          asLong(col("n_bigrams")).as("n_bigrams"),
          Q.ppb(col("uni_entropy")).as("uni_ppb"),
          Q.ppb(col("bi_entropy")).as("bi_ppb"),
          Q.ppb(col("cond_entropy")).as("cond_ppb"))
        .orderBy("group")),

    // Heaps'-law vocabulary growth per source: beta from OLS of ln V
    // on ln N over 10 doc-id-threshold sample points — no windows, no
    // per-source prefix sort; beta near 0 = exhausted/templated
    // vocabulary, near 1 = key-smash.
    "q_heaps_law" -> ((s, dir) =>
      graft.operators.Lexical.heapsLaw(
        t(s, dir, "documents"), "source", "doc_id", "text")
        .select(col("group"),
          asLong(col("n_points")).as("n_points"),
          asLong(col("n_tokens")).as("n_tokens"),
          asLong(col("n_types")).as("n_types"),
          Q.ppb(col("beta")).as("beta_ppb"),
          Q.ppb(col("lnk")).as("lnk_ppb"))
        .orderBy("group")),

    // Zipf rank-frequency fit per source: OLS slope of ln(count) on
    // ln(rank) over the top-64 vocabulary (two-phase bounded top-V —
    // no reducer ever sorts a whole vocabulary). Natural text sits
    // near slope −1; the oracle replays the exact rank order and the
    // rank-ascending sum folds.
    "q_zipf_slope" -> ((s, dir) =>
      graft.operators.Lexical.zipfSlope(
        t(s, dir, "documents"), "source", "text", topV = 64)
        .select(col("group"),
          asLong(col("n_points")).as("n_points"),
          asLong(col("c1")).as("c1"),
          Q.ppb(col("slope")).as("slope_ppb"),
          Q.ppb(col("intercept")).as("intercept_ppb"))
        .orderBy("group")),

    // packing-efficiency report over the next-fit packing: per bucket,
    // sequences used, token capacity, waste (negative when oversize
    // docs overflow their lone sequence), and exact ppm efficiency —
    // the metric that decides whether seqLen/bucketDocs are right
    // before a training run burns the padding.
    "q_pack_efficiency" -> ((s, dir) =>
      graft.operators.CorpusOps.packSequences(
        t(s, dir, "documents").select(col("doc_id"),
          asLong(tokenCountWs(col("text"))).as("n_tokens")),
        "doc_id", "n_tokens", seqLen = 256L, bucketDocs = 128L)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          (max(col("seq")) + lit(1L)).as("n_seqs"),
          sum(col("n_tokens")).as("sum_tokens"))
        .withColumn("capacity", col("n_seqs") * lit(256L))
        .withColumn("waste", col("capacity") - col("sum_tokens"))
        .withColumn("efficiency_ppm",
          expr("sum_tokens * 1000000L div capacity"))
        .orderBy("bucket")),

    // k-anonymity audit over (source, lang, length-bucket) quasi
    // identifiers: every doc with its quasi-group size, suppressed flag
    // for groups under k=5 — one group count joined back, no window.
    "q_k_anonymity" -> ((s, dir) =>
      graft.operators.CorpusOps.kAnonymity(
        t(s, dir, "documents")
          .withColumn("len_bucket", expr("n_chars div 100")),
        "doc_id", Seq("source", "lang", "len_bucket"), k = 5L)
        .select(col("doc_id"), col("source"), col("lang"),
          asLong(col("len_bucket")).as("len_bucket"),
          col("group_size"), col("suppressed"))
        .orderBy("doc_id")),

    // overlapping token-window chunking (context-window packing): 64-token
    // chunks every 48 tokens (16-token overlap); map-side only, no shuffle.
    "q_chunk_docs" -> ((s, dir) =>
      graft.operators.CorpusOps.chunkDocuments(
        t(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", chunkTokens = 64, overlap = 16)
        .orderBy("doc_id", "chunk_id")),

    // per-source token-count distribution: exact interpolated percentiles
    // (one partial-agg shuffle; the approx_percentile scale path is
    // spec-gated against these exact values in QuantileSpec).
    "q_quantile_stats" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("source"),
        asLong(tokenCountWs(col("text"))).as("n_tokens"))
      base.groupBy("source").agg(
          asLong(count(lit(1))).as("n_docs"),
          asLong(sum(col("n_tokens"))).as("sum_tokens"),
          expr("percentile(n_tokens, array(0.25, 0.5, 0.75, 0.95))").as("__p"))
        .select(col("source"), col("n_docs"), col("sum_tokens"),
          (col("sum_tokens").cast("double") / col("n_docs").cast("double"))
            .as("avg_tokens"),
          element_at(col("__p"), 1).as("p25"),
          element_at(col("__p"), 2).as("p50"),
          element_at(col("__p"), 3).as("p75"),
          element_at(col("__p"), 4).as("p95"))
        .orderBy("source")
    }),

    // BPE tokenizer: train 100 merges on the corpus word table (the one
    // corpus-scale pass is the word-frequency agg; the merge loop runs on
    // the Zipf-bounded table), then encode every doc. Deterministic, no
    // SQL oracle (iterative merges) → golden-pinned.
    "q_bpe_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.operators.Bpe.train(docs, "text", numMerges = 100)
      graft.operators.Bpe.encode(docs, "doc_id", "text", model)
        .select(col("doc_id"), asLong(col("n_words")).as("n_words"),
          asLong(col("n_bpe_tokens")).as("n_bpe_tokens"),
          array_join(slice(col("tokens"), 1, 8), " ").as("head_tokens"))
        .orderBy("doc_id")
    }),

    // unigram-LM (SentencePiece-style) tokenizer: Viterbi-EM over the
    // word table, max-likelihood segmentation at encode. Deterministic
    // seeded pipeline, golden-pinned (float log-probs + iterative EM have
    // no SQL oracle); optimality/round-trip/monotonic-likelihood gates
    // live in UnigramLmSpec.
    "q_unigram_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.operators.UnigramLm.train(docs, "text",
        vocabSize = 400, emIters = 2)
      graft.operators.UnigramLm.encode(docs, "doc_id", "text", model)
        .select(col("doc_id"), asLong(col("n_words")).as("n_words"),
          asLong(col("n_pieces")).as("n_pieces"),
          array_join(slice(col("tokens"), 1, 8), " ").as("head_tokens"))
        .orderBy("doc_id")
    }),

    // BPE training evidence UNDER THE ORACLE: the first 10 merge picks —
    // (step, pair, exact weighted pair count) — are pure integers over
    // the word table, so DuckDB replays the whole merge loop as unrolled
    // CTEs: adjacent-pair counting via list unnest, the (count desc,
    // pair asc) argmax, and merge application as a boundary-safe string
    // replace over '{sym}'-wrapped sequences (replace scans the input
    // left-to-right and never rescans its own output — exactly the
    // trainer's non-overlapping merge semantics). The full 100-merge
    // encode face stays golden-pinned above.
    "q_bpe_evidence" -> ((s, dir) => {
      val (_, trace) = graft.operators.Bpe.trainTrace(
        t(s, dir, "documents"), "text", numMerges = 10)
      import s.implicits._
      trace.toDF("step", "left_sym", "right_sym", "pair_count")
        .select(asLong(col("step")).as("step"), col("left_sym"),
          col("right_sym"), asLong(col("pair_count")).as("pair_count"))
        .orderBy("step")
    }),

    // WordPiece merge evidence (the THIRD tokenizer family): first 10
    // likelihood-ratio picks — pair count AND both symbol counts as
    // exact weighted integers. The argmax compares the QUANTIZED score
    // (pairCount << 40) div (cntA·cntB) — BigInt driver-side, HUGEINT
    // in the oracle — so no float ratio whose ulp could flip a pick
    // (the PPS-key quantization trick applied to tokenizer training).
    "q_wordpiece_evidence" -> ((s, dir) => {
      val (_, trace) = graft.operators.WordPiece.trainTrace(
        t(s, dir, "documents"), "text", numMerges = 10)
      import s.implicits._
      trace.toDF("step", "left_sym", "right_sym", "pair_count",
          "left_count", "right_count")
        .select(asLong(col("step")).as("step"), col("left_sym"),
          col("right_sym"), asLong(col("pair_count")).as("pair_count"),
          asLong(col("left_count")).as("left_count"),
          asLong(col("right_count")).as("right_count"))
        .orderBy("step")
    }),

    // unigram-LM seed evidence UNDER THE ORACLE: the exact integer
    // substring-mass table the trainer seeds from (score = Σ count×len,
    // rank by (score desc, piece asc), truncated to the trainer's seed
    // budget), computed fully relationally — the corpus-scale pass of
    // the tokenizer with no driver loop at all. EM refinement stays
    // spec-gated + pinned above.
    "q_unigram_evidence" -> ((s, dir) =>
      graft.operators.UnigramLm.seedEvidence(
        t(s, dir, "documents"), "text", vocabSize = 400)),

    // duplicate-span STRIPPING (the action dupSpans measures): tokens
    // covered by a cross-doc duplicate trigram removed, unique prose
    // rebuilt in order.
    "q_strip_spans" -> ((s, dir) =>
      graft.operators.CorpusOps.stripDupSpans(
        t(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", n = 3)
        .orderBy("doc_id")),

    // corpus snapshot diff by content hash: prev = ids < 480, next = ids
    // >= 20 with every 50th doc's text perturbed → added/removed/changed/
    // unchanged; the join shuffles 16-byte digests, not bodies.
    "q_corpus_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val prev = docs.filter(col("doc_id") < 480)
      val next = docs.filter(col("doc_id") >= 20)
        .select(col("doc_id"),
          when(col("doc_id") % 50 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      graft.operators.CorpusOps.corpusDiff(prev, next, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // per-shard manifest over the packed corpus: counts, token sums, id
    // range, and an order-insensitive md5-derived content checksum
    // (decimal sum folded mod 2^63-1 to a BIGINT — exact and
    // identically canonicalized in both engines).
    "q_shard_manifest" -> ((s, dir) => {
      val packed = graft.operators.CorpusOps.packShards(
        t(s, dir, "documents").select(col("doc_id"),
          asLong(tokenCountWs(col("text"))).as("n_tokens"), col("text")),
        "doc_id", "n_tokens", budget = 5000L)
      graft.operators.CorpusOps.shardManifest(packed, "doc_id", "n_tokens",
          conv(substring(md5(to_binary(col("text"), lit("utf-8"))), 20, 13),
            16, 10).cast("decimal(38,0)"))
        .select(col("shard_id"), asLong(col("n_docs")).as("n_docs"),
          asLong(col("n_tokens")).as("n_tokens"),
          col("first_id"), col("last_id"), col("content_checksum"))
        .orderBy("shard_id")
    }),

    // mixture upsampling (epoch reweighting): src0 at 2.5 epochs, src1 at
    // 1.0, src2 at 0.4, everything else dropped — deterministic hash
    // fractions, map-side explode, no RNG.
    "q_sample_epochs" -> ((s, dir) =>
      graft.operators.CorpusOps.upsampleMixture(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        Map("src0" -> 2500000L, "src1" -> 1000000L, "src2" -> 400000L))
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy("doc_id", "epoch")),

    // domain capping: at most 20 docs per source, selected by md5-hash
    // order through the bounded-heap aggregator (no per-group window
    // sort) — deterministic and stable under corpus growth.
    "q_domain_cap" -> ((s, dir) =>
      graft.operators.CorpusOps.capPerGroup(
        t(s, dir, "documents"), "doc_id", "source", k = 20)
        .orderBy("source", "sample_rank")),

    // per-source distinct-trigram cardinality (two-level exact count; the
    // approx_count_distinct scale path is spec-gated in CardinalitySpec).
    "q_ngram_stats" -> ((s, dir) => {
      val sh = t(s, dir, "documents").select(col("source"),
        explode(graft.functions.TextFunctions.wordShingles(col("text"), 3))
          .as("s"))
      sh.groupBy("source", "s").agg(count(lit(1)).as("__n"))
        .groupBy("source").agg(
          asLong(count(lit(1))).as("distinct_trigrams"),
          asLong(sum(col("__n"))).as("doc_trigram_rows"))
        .orderBy("source")
    }),

    // pairwise n-gram overlap matrix between languages: exact set sizes,
    // intersections, containment and Jaccard — the pre-mixing redundancy
    // / contamination diagnostic, complete matrix incl. zero pairs.
    "q_source_overlap" -> ((s, dir) =>
      graft.operators.CorpusOps.sourceOverlap(
        t(s, dir, "documents"), "text", "lang", n = 3)
        .select(col("grp_a"), col("grp_b"), asLong(col("n_a")).as("n_a"),
          asLong(col("n_b")).as("n_b"),
          asLong(col("n_common")).as("n_common"),
          col("containment_a"), col("containment_b"), col("jaccard"))
        .orderBy("grp_a", "grp_b")),

    // BM25 keyword retrieval (Lucene +1-idf variant): top-20 docs for a
    // 3-term query; per-doc score folds term contributions in ascending
    // token order so the double is bitwise-deterministic vs the oracle.
    "q_bm25" -> ((s, dir) =>
      graft.operators.Retrieval.bm25(t(s, dir, "documents"),
        "doc_id", "text", Seq("spark", "shuffle", "partition"),
        k1 = 1.2, b = 0.75, topN = 20)
        .select(col("doc_id"), asLong(col("n_terms")).as("n_terms"),
          col("score"))),

    // corpus vocabulary: (term frequency, doc frequency) via two-level
    // aggregation, top-100 under a total order.
    "q_vocab_top" -> ((s, dir) =>
      graft.operators.CorpusOps.vocabulary(
        t(s, dir, "documents"), "doc_id", "text", 100)
        .select(col("token"), asLong(col("tf")).as("tf"),
          asLong(col("df")).as("df"))),

    // benchmark decontamination: corpus docs sharing >= 5% of an "eval"
    // doc's distinct 3-shingles (containment, broadcast eval index).
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.CorpusOps.decontaminate(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
        "doc_id", "text", shingleN = 3, minContainment = 0.05)
        .select(col("corpus_id"), col("eval_id"),
          asLong(col("overlap")).as("overlap"), col("containment"))
        .orderBy("corpus_id", "eval_id")
    }),

    // Gopher-style quality gates: per-rule flags + keep conjunction,
    // exact-integer stats so the booleans compare bitwise.
    "q_quality_gates" -> ((s, dir) =>
      graft.operators.CorpusOps.qualityGates(
        t(s, dir, "documents"), "text",
        minWords = 50, maxWords = 100000,
        minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
        minAlphaWordFrac = 0.8)
        .select(col("doc_id"), col("n_words"), col("gate_n_words"),
          col("gate_mean_word_len"), col("gate_alpha_frac"), col("keep"))
        .orderBy("doc_id")),

    // per-doc keyword extraction: top-3 tokens by tf·(N/df) — rational
    // idf keeps the score an exact integer ratio (same ranking as log
    // idf), broadcast df table, bounded per-key top-k.
    "q_tfidf_keywords" -> ((s, dir) =>
      graft.operators.CorpusOps.tfidfKeywords(
        t(s, dir, "documents"), "doc_id", "text", k = 3)
        .select(col("doc_id"), col("token"),
          asLong(col("tf")).as("tf"), asLong(col("df")).as("df"),
          col("score"))
        .orderBy("doc_id", "token")),

    // Gopher repetition stats: duplicate-word and top-bigram fractions
    // plus the repetition gate; exact integer ratios.
    "q_repetition" -> ((s, dir) =>
      graft.operators.CorpusOps.repetitionStats(
        t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), asLong(col("n_words")).as("n_words"),
          asLong(col("n_distinct_words")).as("n_distinct_words"),
          col("dup_word_frac"), col("top_bigram_frac"),
          col("gate_repetition"))
        .orderBy("doc_id")),

    // the REST of the Gopher repetition battery: top-2/3/4-gram and
    // duplicated-5/10-gram character coverage in exact integer ppm
    // (occurrences×length convention, DECIMAL-widened multiply, BIGINT
    // out) plus the published drop-threshold gate — no doubles anywhere.
    // The parquet fixture contains NO intra-doc duplicated 5/10-grams
    // (checked corpus-wide), so three constructed repetitive docs ride
    // along to keep the dup path oracle-exercised, not vacuously zero.
    "q_repetition_ngrams" -> ((s, dir) => {
      import s.implicits._
      val planted = Seq(
        (1000001L, "p q r s t p q r s t u v w x y z"),
        (1000002L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " +
          "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 tail"),
        (1000003L, Seq.fill(50)("a").mkString(" ")))
        .toDF("doc_id", "text")
      graft.operators.CorpusOps.ngramRepetition(
        t(s, dir, "documents").select(col("doc_id"), col("text"))
          .unionByName(planted), "doc_id", "text")
        .select(col("doc_id"), asLong(col("n_chars")).as("n_chars"),
          col("top2_ppm"), col("top3_ppm"), col("top4_ppm"),
          col("dup5_ppm"), col("dup10_ppm"), col("gate_ngram_rep"))
        .orderBy("doc_id")
    }),

    // line/paragraph half of the repetition battery: duplicate-unit and
    // duplicate-char fractions in exact ppm over a newline-bearing
    // inline fixture (the parquet documents carry no newlines), with
    // the published gate
    "q_repetition_lines" -> ((s, _) => {
      import s.implicits._
      s.createDataset(Seq(
        (1L, "alpha\nbeta\nalpha\ngamma"),
        (2L, "para one\n\npara two\n\npara one"),
        (3L, "clean\ntext\nhere"),
        (4L, "x\nx\nx\nx"),
        (5L, "single line, no breaks")))
        .toDF("doc_id", "text")
        .transform(d => graft.operators.CorpusOps.lineRepetition(
          d, "doc_id", "text"))
        .select(col("doc_id"), asLong(col("n_lines")).as("n_lines"),
          col("dup_line_ppm"), col("dup_line_char_ppm"),
          asLong(col("n_paras")).as("n_paras"),
          col("dup_para_ppm"), col("dup_para_char_ppm"),
          col("gate_line_rep"))
        .orderBy("doc_id")
    }),

    // PII scrub: emails/phones/IPv4 → typed placeholders (regexes in the
    // Java∩RE2 dialect so the oracle replays them verbatim).
    "q_pii_scrub" -> ((s, _) => {
      import s.implicits._
      s.createDataset(Seq(
        (1L, "contact us at support@example.com or sales@firm.co.uk today"),
        (2L, "call 555-123-4567 or 555.987.6543 x89"),
        (3L, "server at 192.168.1.1 and 10.0.0.255 responded"),
        (4L, "no pii here, just text"),
        (5L, "mixed: a@b.io from 127.0.0.1 dialed 800-555-0199")))
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          TextFunctions.scrubPii(col("text")).as("scrubbed"))
        .orderBy("doc_id")
    }),

    // Cohen's kappa between the Gopher keep-gate and the repetition
    // gate — exact confusion counts, fixed-association float faces.
    "q_gate_agreement" -> ((s, dir) => {
      val g = graft.operators.CorpusOps.qualityGates(
        t(s, dir, "documents"), "text",
        minWords = 50, maxWords = 100000,
        minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
        minAlphaWordFrac = 0.8)
        .select(col("doc_id"), col("keep"))
      val r = graft.operators.CorpusOps.repetitionStats(
        t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("gate_repetition"))
      graft.operators.CorpusOps.agreementStats(
        g.join(r, "doc_id"), "keep", "gate_repetition")
    }),

    // greedy max-coverage pick of 5 docs by distinct 3-shingle gain —
    // deterministic argmax per round (ties -> smallest id), so the
    // 5-round unrolled oracle replays every pick; covered_total is
    // independently re-derived in the oracle as count(covered set).
    "q_coverage_pick" -> ((s, dir) =>
      graft.operators.CorpusOps.greedyCoverage(
        t(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", k = 5)
        .orderBy("sel_rank")),

    // robust per-source length outliers: |x - median| > 3 * MAD, every
    // quantity an exact decimal via the doubled-median trick (med2 =
    // 2*median, mad4 = 4*MAD; flag = 2*dev2 > k*mad4 — no division),
    // so both engines replay the rank-selected medians bit-for-bit.
    "q_mad_outliers" -> ((s, dir) =>
      graft.operators.CorpusOps.madOutliers(
        t(s, dir, "documents").select(col("source"), col("doc_id"),
          asLong(tokenCountWs(col("text"))).as("n_tokens")),
        "source", "doc_id", "n_tokens", k = 3)
        .orderBy("source", "doc_id")),

    // payment-card detection: regex candidates gated by the Luhn mod-10
    // checksum (integer `aggregate` over digit positions — the sum itself
    // is the oracle evidence, not just the boolean). A digit-run regex
    // alone over-redacts; the checksum keeps order ids and timestamps.
    "q_luhn_cards" -> ((s, _) => {
      import s.implicits._
      s.createDataset(CardDocs).toDF("doc_id", "text")
        .select(col("doc_id"),
          explode(TextFunctions.cardCandidates(col("text"))).as("raw"))
        .withColumn("digits", TextFunctions.cardDigits(col("raw")))
        .select(col("doc_id"), col("raw"), col("digits"),
          asLong(length(col("digits"))).as("n_digits"),
          asLong(TextFunctions.luhnSum(col("digits"))).as("luhn_sum"),
          TextFunctions.luhnValid(col("digits")).as("is_valid"))
        .orderBy("doc_id", "raw")
    }),

    // card redaction: fold only the Luhn-VALID candidates through a
    // literal replace (oracle replays the same fold via list_reduce).
    "q_card_scrub" -> ((s, _) => {
      import s.implicits._
      s.createDataset(CardDocs).toDF("doc_id", "text")
        .select(col("doc_id"),
          TextFunctions.scrubCards(col("text")).as("scrubbed"))
        .orderBy("doc_id")
    }),

    // contiguous 0-based training-order index without a global sort:
    // same deterministic two-phase prefix machinery as q_pack_shards
    // with a count of 1 per row.
    "q_global_rank" -> ((s, dir) =>
      graft.operators.CorpusOps.globalOrderIndex(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
        .select(col("doc_id"), col("rank"))
        .orderBy("doc_id")),

    // curriculum schedule: easy-first by length bucket, md5-shuffled
    // within each bucket (a fresh permutation per epoch seed), rank via
    // the same two-phase prefix — no global sort.
    "q_curriculum" -> ((s, dir) =>
      graft.operators.CorpusOps.curriculumOrder(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", expr("n_chars div 50"), seed = "epoch1")
        .select(col("doc_id"),
          expr("n_chars div 50").as("bucket"),
          col("curriculum_rank"))
        .orderBy("doc_id")),

    // deterministic per-epoch corpus shuffle: contiguous rank under the
    // md5(key, seed) order — stable across reruns/partitionings, a fresh
    // permutation per seed; no global sort (two-phase prefix sum).
    "q_corpus_shuffle" -> ((s, dir) =>
      graft.operators.CorpusOps.shuffleOrder(
        t(s, dir, "documents").select(col("doc_id")), "doc_id",
        seed = "epoch1")
        .select(col("doc_id"), col("shuffle_rank"))
        .orderBy("doc_id")),

    // skip-gram PMI collocations (window 2, pair count >= 30): map-side
    // pair generation, one (a, b) count shuffle, broadcast unigrams.
    // the oracle gate compares the exact IEEE pmi_ratio; pmi = ln(ratio)
    // is spec-gated (Java and DuckDB ln disagree in the last ulp).
    "q_pmi_pairs" -> ((s, dir) =>
      graft.operators.Cooccur.pmiPairs(
        t(s, dir, "documents"), "text", window = 2, minCount = 30L)
        .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
          col("pmi_ratio"))
        .orderBy("a", "b")),

    // token frequency spectrum (count-of-counts, the Zipf diagnostic):
    // two cascaded hash aggs, both map-side partial.
    "q_freq_spectrum" -> ((s, dir) =>
      graft.operators.Cooccur.frequencySpectrum(
        t(s, dir, "documents"), "text")
        .orderBy("freq")),

    // exact heavy hitters (tokens >= 0.5% of all occurrences) — the
    // oracle-checkable formulation; the Misra-Gries bounded-memory scale
    // path is spec-gated against it (FrequentItemsSpec), mirroring the
    // HLL and approx_percentile gates.
    "q_heavy_hitters" -> ((s, dir) =>
      graft.operators.FrequentItems.heavyHitters(
        t(s, dir, "documents"), "text", minFrac = 0.005)
        .orderBy("tok")),

    // deflate compression ratio (codec-based repetitiveness gate):
    // native codegen'd expression; DuckDB has no deflate → golden-pinned
    // (GoldenPinSpec), properties spec-gated (DeflateRatioSpec).
    "q_compress_ratio" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.compressionRatio(col("text"))
            .as("deflate_ratio"))
        .orderBy("doc_id")),

    // deflate evidence UNDER THE ORACLE: level-0 (stored-mode) output
    // length from the REAL Deflater has the closed form
    // n + 5·max(1, ⌈n/65535⌉), so the codec plumbing (UTF-8 bytes,
    // reset/setInput/finish, drain loop, length accounting)
    // hash-compares as exact integers; only level-6's Huffman output is
    // engine-specific and stays pinned above.
    "q_deflate_evidence" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          asLong(octet_length(col("text"))).as("n_bytes"),
          graft.functions.TextFunctions.deflateStoredLen(col("text"))
            .as("deflate0_len"))
        .orderBy("doc_id")),

    // Unicode NFC normalization over an inline fixture of byte-variant
    // spellings (combining marks, Hangul jamo, singleton Ω, canonical
    // reordering) — the same rows the oracle rebuilds with chr() so
    // DuckDB's utf8proc NFC checks the JDK's (q_pii_scrub pattern:
    // literal fixture where the parquet tier has no interesting input).
    "q_unicode_norm" -> ((s, _) => {
      import s.implicits._
      s.createDataset(Seq(
        (1L, "café combining"),
        (2L, "café precomposed"),
        (3L, "Å ring"),
        (4L, "각 jamo"),
        (5L, "plain ascii"),
        (6L, "Ω ohm"),
        (7L, "ẹ́ reorder")))
        .toDF("doc_id", "txt")
        .select(col("doc_id"),
          graft.functions.TextFunctions.normalizeUnicode(col("txt"))
            .as("nfc"),
          length(graft.functions.TextFunctions.normalizeUnicode(col("txt")))
            .cast(LongType).as("nfc_len"))
        .orderBy("doc_id")
    }),

    // per-column data profile (row/null/distinct counts, lexical
    // min/max) in ONE aggregation pass; the HLL no-Expand scale variant
    // is spec-gated against this exact form (CorpusOpsSpec).
    "q_profile" -> ((s, dir) =>
      graft.operators.CorpusOps.profile(t(s, dir, "documents"))
        .orderBy("col_name")),

    // exact phrase search: start-marker voting (posting for term i votes
    // start = pos - i; all-k votes = occurrence) — one term-pruned
    // shuffle, no k-way positional self-join, overlap-correct.
    "q_phrase_search" -> ((s, dir) =>
      graft.operators.Retrieval.phraseSearch(
        t(s, dir, "documents"), "doc_id", "text", "slow hash batch")
        .orderBy("doc_id")),

    // relational pivot: per-source token totals spread across the five
    // (SF-stable) language columns — explicit value list keeps the
    // schema deterministic; one partial-agg shuffle, no transpose op.
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("source"), col("lang"),
          asLong(tokenCountWs(col("text"))).as("n_tokens"))
        .groupBy("source")
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(sum(col("n_tokens")))
        // single-agg pivot names columns by the pivot value; absent
        // (source, lang) cells bypass the agg entirely → null, so
        // zero-fill AFTER the pivot to match the oracle's COALESCE
        .select(col("source") +: Seq("de", "en", "es", "fr", "zh")
          .map(l => coalesce(col(l), lit(0L)).as(s"${l}_tokens")): _*)
        .orderBy("source")),

    // blocklist sweep: ONE Aho–Corasick pass per document over the
    // whole phrase set (overlapping families included — "join" inside
    // "hash join", "table" inside "value table") vs the oracle's
    // per-pattern instr/replace-count arithmetic.
    "q_blocklist_hits" -> ((s, dir) =>
      graft.operators.Blocklist.hits(
        t(s, dir, "documents"), "doc_id", "text", BlockPatterns)
        .select(col("doc_id"), asLong(col("pid")).as("pid"), col("pattern"),
          asLong(col("first_pos")).as("first_pos"),
          asLong(col("n_hits")).as("n_hits"))
        .orderBy("doc_id", "pid")),

    // the keep/drop policy face on the same scan: severity-weighted
    // score per document, every document reported (the audit view a
    // curation run publishes alongside the filter itself).
    "q_blocklist_gate" -> ((s, dir) =>
      graft.operators.Blocklist.gate(
        t(s, dir, "documents"), "doc_id", "text",
        BlockPatterns.zip(BlockWeights), threshold = 12L)
        .select(col("doc_id"), asLong(col("n_patterns_hit")).as("n_patterns_hit"),
          asLong(col("n_hits_total")).as("n_hits_total"),
          asLong(col("score")).as("score"), col("keep"))
        .orderBy("doc_id")),

    // tokenizer-vocab coverage: out-of-vocabulary rate per document
    // against the corpus top-25 token vocabulary (count-desc,
    // token-asc tiebreak — deterministic on both engines). The vocab
    // is a TakeOrdered 25-row table broadcast into the coverage join;
    // the corpus explodes once per aggregation, never collects.
    "q_oov_rate" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("__n"))
        .orderBy(col("__n").desc, col("tok")).limit(25)
        .select(col("tok"), lit(1).as("__in"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), asLong(col("n_tokens")).as("n_tokens"),
          asLong(col("n_oov")).as("n_oov"),
          expr("n_oov * 1000000L div n_tokens").as("oov_ppm"))
        .orderBy("doc_id")
    }),

    // the scrub face of the blocklist lifecycle: same-length masking
    // with sequential nested-replace semantics, run on the gate's DROP
    // slice only (scrub is the output-dominated rewrite; detection
    // stays single-pass). Length is provably preserved.
    "q_blocklist_scrub" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val dropped = graft.operators.Blocklist.gate(
        docs, "doc_id", "text", BlockPatterns.zip(BlockWeights),
        threshold = 12L).filter(!col("keep")).select("doc_id")
      graft.operators.Blocklist.scrub(
        docs.join(dropped, Seq("doc_id"), "left_semi"),
        "doc_id", "text", BlockPatterns)
        .select(col("doc_id"), col("scrubbed"),
          asLong(length(col("scrubbed"))).as("n_chars"),
          asLong(length(col("scrubbed")) -
            length(regexp_replace(col("scrubbed"), "\\*", "")))
            .as("n_masked"))
        .orderBy("doc_id")
    }),

    // exact-canary decontamination (the GPT-3/Llama-report n-gram
    // purge, word-boundary exact): every eval 4-gram becomes one
    // automaton pattern, ONE O(len) pass flags each training doc —
    // the blocklist engine composed with the contamination semantic
    // (q_decontaminate keeps the fuzzy containment face). At 100 TB
    // the eval set stays benchmark-sized, so the whole pattern set
    // ships in the plan and the sweep is shuffle-free until the
    // per-doc report.
    "q_decontaminate_exact" -> ((s, dir) => {
      val canaries = evalCanaries(s, dir)
      graft.operators.Blocklist.gate(
        t(s, dir, "documents").filter(col("doc_id") >= 10)
          .withColumn("padded", concat(lit(" "), col("text"), lit(" "))),
        "doc_id", "padded", canaries.map((_, 1L)), threshold = 1L)
        .select(col("doc_id").as("corpus_id"),
          asLong(col("n_patterns_hit")).as("n_canaries"),
          asLong(col("n_hits_total")).as("n_hits_total"),
          (!col("keep")).as("contaminated"))
        .orderBy("corpus_id")
    })
  )

  /** Exact-canary decontamination fixture: distinct space-padded word
    * 4-grams of the eval slice (doc_id < 10), collected driver-side
    * (bounded by contract — eval sets are benchmark-sized, not
    * corpus-sized) and compiled into ONE automaton swept over every
    * training document. Space padding enforces word boundaries ("a row
    * scan x" must not match inside "data row scan x").
    */
  private def evalCanaries(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[String] = {
    import s.implicits._
    val w = split(col("text"), " ")
    val idxs = when(size(w) >= 4, sequence(lit(1), size(w) - 3))
      .otherwise(array().cast("array<int>"))
    t(s, dir, "documents").filter(col("doc_id") < 10)
      .select(explode(transform(idxs, i => concat_ws(" ",
        element_at(w, i), element_at(w, i + 1),
        element_at(w, i + 2), element_at(w, i + 3)))).as("g"))
      .distinct().orderBy("g").as[String].collect().toSeq
      .map(g => " " + g + " ")
  }

  /** Blocklist fixture for `q_blocklist_hits`/`q_blocklist_gate`:
    * corpus-vocabulary phrases chosen so the pattern set exercises the
    * substring-family cases (a pattern inside another pattern) and a
    * self-overlap-capable pattern ("a a"). Weights mirror a severity
    * policy: hard blockers high, boilerplate low.
    */
  private val BlockPatterns: Seq[String] =
    Seq("slow", "hash join", "join", "value table", "table", "a a")
  private val BlockWeights: Seq[Long] = Seq(1L, 5L, 1L, 3L, 1L, 2L)

  /** The [[graft.operators.CorpusOps.greedyCoverage]] rounds unrolled:
    * per round, gains exclude previously selected ids and covered
    * shingles; the winner CTE is a deterministic ORDER BY ... LIMIT 1;
    * the covered set folds via UNION (dedups). MATERIALIZED where a CTE
    * is read by several successors.
    */
  /** Unrolled-CTE replay of the first `k` BPE merges (q_bpe_evidence).
    *
    * State between steps is the word table with each word's symbol
    * sequence encoded as a '{sym}'-wrapped string ('{l}{o}{w</w>}'):
    * '{'/'}' cannot occur inside a symbol (lowercase alpha + '</w>'
    * concatenations only), so the pair pattern '{a}{b}' matches exactly
    * at symbol boundaries, and SQL `replace` — which scans the input
    * left-to-right and never rescans its own output — applies the merge
    * with precisely the trainer's non-overlapping semantics (e.g.
    * '{a}{a}{a}' + merge (a,a) → '{aa}{a}', not '{aa}{aa}').
    * Per step: unwrap to a list, count adjacent pairs weighted by word
    * frequency (overlapping occurrences count, as in the trainer), take
    * the (count desc, pair asc) argmax among pairs with count ≥ 2, then
    * rewrite. ASCII-only symbols make Scala UTF-16 and DuckDB UTF-8
    * string orderings agree.
    */
  private def bpeEvidenceOracle(k: Int): String = {
    val head =
      """WITH tok AS (SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '')) AS w
        |  FROM documents),
        |wt AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok
        |  GROUP BY w ORDER BY n DESC, w LIMIT 100000),
        |s0 AS (SELECT '{' || array_to_string(list_transform(
        |      generate_series(1, length(w)),
        |      i -> CASE WHEN i = length(w)
        |        THEN substr(w, CAST(i AS INT), 1) || '</w>'
        |        ELSE substr(w, CAST(i AS INT), 1) END), '}{') || '}' AS syms,
        |    n FROM wt)""".stripMargin
    val steps = (1 to k).map { i =>
      s"""l$i AS (SELECT string_split(substr(syms, 2, length(syms) - 2),
         |    '}{') AS ls, n FROM s${i - 1}),
         |pr$i AS (SELECT unnest(list_transform(range(1, len(ls)),
         |    j -> [ls[j], ls[j + 1]])) AS pr, n FROM l$i),
         |p$i AS (SELECT pr[1] AS a, pr[2] AS b,
         |    CAST(sum(n) AS BIGINT) AS cnt
         |  FROM pr$i GROUP BY 1, 2 HAVING sum(n) >= 2),
         |b$i AS (SELECT $i AS step, a, b, cnt FROM p$i
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |s$i AS (SELECT replace(syms, '{' || a || '}{' || b || '}',
         |    '{' || a || b || '}') AS syms, n FROM s${i - 1}, b$i)""".stripMargin
    }
    val union = (1 to k).map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ")
    (head +: steps).mkString(",\n") +
      s""",
         |ev AS ($union)
         |SELECT CAST(step AS BIGINT) AS step, a AS left_sym, b AS right_sym,
         |  cnt AS pair_count FROM ev ORDER BY step""".stripMargin
  }

  /** Unrolled-CTE replay of the first `k` WordPiece merges
    * (q_wordpiece_evidence) — the [[bpeEvidenceOracle]] state machine
    * with two changes: symbols carry the `##` continuation prefix
    * instead of the `</w>` suffix ('#' cannot collide with the '{'/'}'
    * wrapping either), and the per-step argmax ranks by the quantized
    * likelihood score `(cnt · 2^40) // (cntA · cntB)` in HUGEINT — the
    * exact integer the Scala trainer computes in BigInt — with (a, b)
    * tie-break. Merge application strips the right symbol's `##` on
    * concatenation, as the trainer does.
    */
  private def wordpieceEvidenceOracle(k: Int): String = {
    val head =
      """WITH tok AS (SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '')) AS w
        |  FROM documents),
        |wt AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok
        |  GROUP BY w ORDER BY n DESC, w LIMIT 100000),
        |s0 AS MATERIALIZED (SELECT '{' || array_to_string(list_transform(
        |      generate_series(1, length(w)),
        |      i -> CASE WHEN i = 1 THEN substr(w, CAST(i AS INT), 1)
        |        ELSE '##' || substr(w, CAST(i AS INT), 1) END), '}{')
        |    || '}' AS syms, n FROM wt)""".stripMargin
    val steps = (1 to k).map { i =>
      s"""l$i AS MATERIALIZED (SELECT string_split(
         |    substr(syms, 2, length(syms) - 2), '}{') AS ls, n
         |  FROM s${i - 1}),
         |pr$i AS (SELECT unnest(list_transform(range(1, len(ls)),
         |    j -> [ls[j], ls[j + 1]])) AS pr, n FROM l$i),
         |p$i AS (SELECT pr[1] AS a, pr[2] AS b,
         |    CAST(sum(n) AS BIGINT) AS cnt
         |  FROM pr$i GROUP BY 1, 2 HAVING sum(n) >= 2),
         |ue$i AS (SELECT unnest(ls) AS sym, n FROM l$i),
         |u$i AS MATERIALIZED (SELECT sym, CAST(sum(n) AS BIGINT) AS un
         |  FROM ue$i GROUP BY 1),
         |b$i AS MATERIALIZED (SELECT $i AS step, p.a, p.b, p.cnt,
         |    ua.un AS un_a, ub.un AS un_b
         |  FROM p$i p JOIN u$i ua ON p.a = ua.sym
         |    JOIN u$i ub ON p.b = ub.sym
         |  ORDER BY (CAST(p.cnt AS HUGEINT) * 1099511627776)
         |      // (CAST(ua.un AS HUGEINT) * ub.un) DESC, p.a, p.b LIMIT 1),
         |s$i AS MATERIALIZED (SELECT replace(syms,
         |    '{' || a || '}{' || b || '}',
         |    '{' || a || CASE WHEN starts_with(b, '##') THEN substr(b, 3)
         |      ELSE b END || '}') AS syms, n FROM s${i - 1}, b$i)""".stripMargin
    }
    val union = (1 to k).map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ")
    (head +: steps).mkString(",\n") +
      s""",
         |ev AS ($union)
         |SELECT CAST(step AS BIGINT) AS step, a AS left_sym,
         |  b AS right_sym, cnt AS pair_count, un_a AS left_count,
         |  un_b AS right_count FROM ev ORDER BY step""".stripMargin
  }

  private def coverageOracle(k: Int): String = {
    val head =
      """WITH toks AS MATERIALIZED (SELECT doc_id, string_split(text, ' ')
        |    AS w FROM documents WHERE doc_id < 100),
        |sh AS MATERIALIZED (SELECT doc_id AS id, unnest(list_distinct(
        |    list_transform(range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
        |  FROM toks)""".stripMargin
    val rounds = (1 to k).map { r =>
      val excl =
        if (r == 1) ""
        else {
          val ids = (1 until r).map(j => s"SELECT id FROM w$j")
            .mkString(" UNION ALL ")
          s"\n  WHERE id NOT IN ($ids)" +
            s"\n    AND sh NOT IN (SELECT sh FROM c${r - 1})"
        }
      val cdef =
        if (r == 1)
          "c1 AS MATERIALIZED (SELECT DISTINCT sh FROM sh JOIN w1 USING (id))"
        else
          s"c$r AS MATERIALIZED (SELECT sh FROM c${r - 1} " +
            s"UNION SELECT sh.sh FROM sh JOIN w$r USING (id))"
      s"""g$r AS (SELECT id, count(*) AS gain FROM sh$excl GROUP BY id),
         |w$r AS MATERIALIZED (SELECT id, gain FROM g$r
         |  ORDER BY gain DESC, id LIMIT 1),
         |$cdef""".stripMargin
    }
    val sel = (1 to k).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS sel_rank, id AS doc_id,
         |  CAST(gain AS BIGINT) AS gain,
         |  (SELECT CAST(count(*) AS BIGINT) FROM c$r) AS covered_total
         |FROM w$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    (head +: rounds).mkString(",\n") + s"\n$sel\nORDER BY sel_rank"
  }

  val oracles: Map[String, String] = Map(
    // bucket = lower 60 bits of md5(doc_id-as-string) mod 100, walked
    // through cumulative weights 90/5/5 — byte-identical split labels.
    "q_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))::BIGINT
        |      % 100 AS b
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_pack_shards" ->
      """SELECT doc_id, n_tokens,
        |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    // 5000 AS BIGINT) AS shard_id
        |FROM (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // the same next-fit recurrence as the engine's per-bucket fold,
    // replayed row-by-row as a recursive CTE (doc ids are non-negative
    // in the fixtures, so `//` bucketing equals the engine's
    // pmod floor form)
    "q_pack_sequences" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
        |    CAST(doc_id // 128 AS BIGINT) AS bucket
        |  FROM documents),
        |r AS (SELECT doc_id, t, bucket,
        |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
        |  FROM d),
        |p(bucket, rn, doc_id, t, seq, off, fill) AS (
        |  SELECT bucket, rn, doc_id, t, CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT), t
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.bucket, r.rn, r.doc_id, r.t,
        |    CASE WHEN p.fill > 0 AND p.fill + r.t > 256
        |         THEN p.seq + 1 ELSE p.seq END,
        |    CASE WHEN p.fill > 0 AND p.fill + r.t > 256
        |         THEN 0 ELSE p.fill END,
        |    (CASE WHEN p.fill > 0 AND p.fill + r.t > 256
        |          THEN 0 ELSE p.fill END) + r.t
        |  FROM r JOIN p ON r.bucket = p.bucket AND r.rn = p.rn + 1)
        |SELECT doc_id, t AS n_tokens, bucket, seq, off AS seq_offset
        |FROM p ORDER BY doc_id""".stripMargin,

    // same trigram construction as the q_ppjoin oracle; membership by
    // exact gram string (the engine probes by xxhash64 — the dupSpans
    // adjudication), counts exact either way
    "q_novelty" ->
      """WITH ct AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents WHERE source <> 'src0'),
        |cg AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
        |  FROM ct),
        |rt AS (SELECT string_split(text, ' ') AS w
        |  FROM documents WHERE source = 'src0'),
        |rg AS (SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
        |  FROM rt)
        |SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(rg.g) AS BIGINT) AS n_known,
        |  CAST(count(*) - count(rg.g) AS BIGINT) AS n_novel,
        |  CAST((count(*) - count(rg.g)) * 1000000 // count(*) AS BIGINT)
        |    AS novelty_ppm
        |FROM cg LEFT JOIN rg ON cg.g = rg.g
        |GROUP BY cg.doc_id ORDER BY doc_id""".stripMargin,

    // the DIRECT score of the same batch — index-probe must equal it
    "q_novelty_incremental" ->
      """WITH ct AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents WHERE source = 'src1'),
        |cg AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
        |  FROM ct),
        |rt AS (SELECT string_split(text, ' ') AS w
        |  FROM documents WHERE source = 'src0'),
        |rg AS (SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
        |  FROM rt)
        |SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(rg.g) AS BIGINT) AS n_known,
        |  CAST(count(*) - count(rg.g) AS BIGINT) AS n_novel,
        |  CAST((count(*) - count(rg.g)) * 1000000 // count(*) AS BIGINT)
        |    AS novelty_ppm
        |FROM cg LEFT JOIN rg ON cg.g = rg.g
        |GROUP BY cg.doc_id ORDER BY doc_id""".stripMargin,

    // keep-longest window → the q_lexical_entropy arithmetic on the
    // kept slice → the q_curriculum rank over the gated survivors
    "q_corpus_prep2" ->
      """WITH k AS (SELECT doc_id, n_chars, text FROM (
        |    SELECT doc_id, n_chars, text, row_number() OVER (
        |      PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id) AS rn
        |    FROM documents) WHERE rn = 1),
        |w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM k),
        |c AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |  FROM w GROUP BY doc_id, w),
        |a AS (SELECT doc_id,
        |    CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    list_reduce(
        |      list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY w),
        |      (a, b) -> a + b) AS s
        |  FROM c GROUP BY doc_id),
        |lx AS (SELECT doc_id,
        |    CAST(floor((ln(CAST(n_tokens AS DOUBLE))
        |      - s / CAST(n_tokens AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |      AS e_ppb,
        |    n_types * 1000000 // n_tokens AS ttr_ppm
        |  FROM a),
        |g AS (SELECT k.doc_id, k.n_chars, lx.e_ppb, lx.ttr_ppm
        |  FROM k JOIN lx ON k.doc_id = lx.doc_id
        |  WHERE e_ppb >= 2900000000 AND ttr_ppm >= 350000)
        |SELECT doc_id, e_ppb, ttr_ppm,
        |  CAST(n_chars // 50 AS BIGINT) AS bucket,
        |  CAST(row_number() OVER (ORDER BY n_chars // 50,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch1'),
        |      18, 15))::BIGINT, doc_id) - 1 AS BIGINT) AS curriculum_rank
        |FROM g ORDER BY doc_id""".stripMargin,

    // the same two passes: (source, md5) dup ledger + source-level
    // word fold; entropy identical to q_lexical_entropy's form
    "q_corpus_card" ->
      """WITH d AS (SELECT source, md5(text) AS h, count(*) AS c
        |  FROM documents GROUP BY source, h),
        |counts AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_distinct
        |  FROM d GROUP BY source),
        |w AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM w GROUP BY source, w),
        |lex AS (SELECT source,
        |    CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    list_reduce(
        |      list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY w),
        |      (a, b) -> a + b) AS s
        |  FROM c GROUP BY source)
        |SELECT counts.source, n_docs, n_distinct,
        |  (n_docs - n_distinct) * 1000000 // n_docs AS dup_ppm,
        |  n_tokens, n_types,
        |  n_types * 1000000 // n_tokens AS ttr_ppm,
        |  n_tokens // n_docs AS tokens_per_doc,
        |  CAST(floor((ln(CAST(n_tokens AS DOUBLE))
        |    - s / CAST(n_tokens AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |    AS entropy_ppb
        |FROM counts JOIN lex ON counts.source = lex.source
        |ORDER BY counts.source""".stripMargin,

    // word-ascending c·ln c fold, entropy = ln N − S/N, ppb edge —
    // the same fixed IEEE sequence Lexical.lexicalStats runs
    "q_lexical_entropy" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |c AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |  FROM w GROUP BY doc_id, w),
        |a AS (SELECT doc_id,
        |    CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(max(c) AS BIGINT) AS max_freq,
        |    list_reduce(
        |      list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY w),
        |      (a, b) -> a + b) AS s
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_types,
        |  n_types * 1000000 // n_tokens AS ttr_ppm, max_freq,
        |  CAST(floor((ln(CAST(n_tokens AS DOUBLE))
        |    - s / CAST(n_tokens AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |    AS entropy_ppb
        |FROM a ORDER BY doc_id""".stripMargin,

    // both ladder rungs replayed: unigram and multiplicity-preserving
    // adjacent bigram counts, gram-ordered folds, identical
    // ln N − S/N edges, cond = bi − uni before the shared ppb edge
    "q_bigram_entropy" ->
      """WITH w AS (SELECT source, string_split(text, ' ') AS w
        |  FROM documents),
        |u AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(w) AS g FROM w) GROUP BY source, g),
        |b AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(list_transform(range(1, len(w)),
        |      i -> w[i] || ' ' || w[i+1])) AS g FROM w)
        |  GROUP BY source, g),
        |ru AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    list_reduce(
        |      list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY g),
        |      (a, x) -> a + x) AS s1
        |  FROM u GROUP BY source),
        |rb AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    list_reduce(
        |      list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY g),
        |      (a, x) -> a + x) AS s2
        |  FROM b GROUP BY source),
        |e AS (SELECT ru.source, n_tokens, n_bigrams,
        |    ln(CAST(n_tokens AS DOUBLE)) - s1 / CAST(n_tokens AS DOUBLE)
        |      AS uni,
        |    ln(CAST(n_bigrams AS DOUBLE)) - s2 / CAST(n_bigrams AS DOUBLE)
        |      AS bi
        |  FROM ru JOIN rb ON ru.source = rb.source)
        |SELECT source AS "group", n_tokens, n_bigrams,
        |  CAST(floor(uni * 1e9 + 0.5) AS BIGINT) AS uni_ppb,
        |  CAST(floor(bi * 1e9 + 0.5) AS BIGINT) AS bi_ppb,
        |  CAST(floor((bi - uni) * 1e9 + 0.5) AS BIGINT) AS cond_ppb
        |FROM e ORDER BY "group"""".stripMargin,

    // first-occurrence vocab + per-doc token tables crossed with the
    // 10 integer thresholds, zero-point filter, k-ordered OLS folds,
    // beta-then-intercept in the same op order
    "q_heaps_law" ->
      """WITH w AS (SELECT source, doc_id,
        |    unnest(string_split(text, ' ')) AS w FROM documents),
        |fd AS (SELECT source, w, min(doc_id) AS fd
        |  FROM w GROUP BY source, w),
        |dt AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS t
        |  FROM w GROUP BY source, doc_id),
        |mx AS (SELECT source, max(doc_id) AS mx
        |  FROM documents GROUP BY source),
        |th AS (SELECT source, k, mx * k // 10 AS thr
        |  FROM mx, unnest(generate_series(1, 10)) u(k)),
        |v AS (SELECT th.source, k,
        |    sum(CASE WHEN fd <= thr THEN 1 ELSE 0 END) AS v
        |  FROM th JOIN fd ON th.source = fd.source GROUP BY th.source, k),
        |n AS (SELECT th.source, k,
        |    sum(CASE WHEN doc_id <= thr THEN t ELSE 0 END) AS n
        |  FROM th JOIN dt ON th.source = dt.source GROUP BY th.source, k),
        |pts AS (SELECT v.source, v.k, v.v, n.n
        |  FROM v JOIN n ON v.source = n.source AND v.k = n.k
        |  WHERE v.v > 0 AND n.n > 0),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_points,
        |    list_reduce(list(ln(CAST(n AS DOUBLE)) ORDER BY k),
        |      (a, b) -> a + b) AS sx,
        |    list_reduce(list(ln(CAST(v AS DOUBLE)) ORDER BY k),
        |      (a, b) -> a + b) AS sy,
        |    list_reduce(list(ln(CAST(n AS DOUBLE)) * ln(CAST(v AS DOUBLE))
        |      ORDER BY k), (a, b) -> a + b) AS sxy,
        |    list_reduce(list(ln(CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE))
        |      ORDER BY k), (a, b) -> a + b) AS sxx
        |  FROM pts GROUP BY source HAVING count(*) >= 2),
        |tot AS (SELECT dt.source, CAST(sum(t) AS BIGINT) AS n_tokens
        |  FROM dt GROUP BY dt.source),
        |ty AS (SELECT fd.source, CAST(count(*) AS BIGINT) AS n_types
        |  FROM fd GROUP BY fd.source),
        |f AS (SELECT s.source, n_points,
        |    (CAST(n_points AS DOUBLE) * sxy - sx * sy)
        |      / (CAST(n_points AS DOUBLE) * sxx - sx * sx) AS beta,
        |    sx, sy
        |  FROM s)
        |SELECT f.source AS "group", n_points, n_tokens, n_types,
        |  CAST(floor(beta * 1e9 + 0.5) AS BIGINT) AS beta_ppb,
        |  CAST(floor((sy - beta * sx) / CAST(n_points AS DOUBLE) * 1e9
        |    + 0.5) AS BIGINT) AS lnk_ppb
        |FROM f JOIN tot ON f.source = tot.source
        |JOIN ty ON f.source = ty.source
        |ORDER BY "group"""".stripMargin,

    // exact top-64 rank (count desc, word asc) per source, the four OLS
    // sums folded in rank order, closed-form slope/intercept, ppb edge
    "q_zipf_slope" ->
      """WITH c AS (SELECT source AS g, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY g, w),
        |r AS (SELECT g, c,
        |    row_number() OVER (PARTITION BY g ORDER BY c DESC, w) AS rank
        |  FROM c QUALIFY rank <= 64),
        |s AS (SELECT g,
        |    CAST(count(*) AS BIGINT) AS n_points,
        |    max(CASE WHEN rank = 1 THEN c END) AS c1,
        |    list_reduce(list(ln(CAST(rank AS DOUBLE)) ORDER BY rank),
        |      (a, b) -> a + b) AS sx,
        |    list_reduce(list(ln(CAST(c AS DOUBLE)) ORDER BY rank),
        |      (a, b) -> a + b) AS sy,
        |    list_reduce(list(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE))
        |      ORDER BY rank), (a, b) -> a + b) AS sxy,
        |    list_reduce(list(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
        |      ORDER BY rank), (a, b) -> a + b) AS sxx
        |  FROM r GROUP BY g),
        |f AS (SELECT g, n_points, c1,
        |    (CAST(n_points AS DOUBLE) * sxy - sx * sy)
        |      / (CAST(n_points AS DOUBLE) * sxx - sx * sx) AS slope,
        |    sx, sy
        |  FROM s)
        |SELECT g AS "group", n_points, CAST(c1 AS BIGINT) AS c1,
        |  CAST(floor(slope * 1e9 + 0.5) AS BIGINT) AS slope_ppb,
        |  CAST(floor((sy - slope * sx) / CAST(n_points AS DOUBLE) * 1e9 + 0.5)
        |    AS BIGINT) AS intercept_ppb
        |FROM f ORDER BY "group"""".stripMargin,

    // same recursive next-fit recurrence as q_pack_sequences, folded to
    // the per-bucket capacity/waste report
    "q_pack_efficiency" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
        |    CAST(doc_id // 128 AS BIGINT) AS bucket
        |  FROM documents),
        |r AS (SELECT doc_id, t, bucket,
        |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
        |  FROM d),
        |p(bucket, rn, doc_id, t, seq, off, fill) AS (
        |  SELECT bucket, rn, doc_id, t, CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT), t
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.bucket, r.rn, r.doc_id, r.t,
        |    CASE WHEN p.fill > 0 AND p.fill + r.t > 256
        |         THEN p.seq + 1 ELSE p.seq END,
        |    CASE WHEN p.fill > 0 AND p.fill + r.t > 256
        |         THEN 0 ELSE p.fill END,
        |    (CASE WHEN p.fill > 0 AND p.fill + r.t > 256
        |          THEN 0 ELSE p.fill END) + r.t
        |  FROM r JOIN p ON r.bucket = p.bucket AND r.rn = p.rn + 1),
        |a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(max(seq) + 1 AS BIGINT) AS n_seqs,
        |    CAST(sum(t) AS BIGINT) AS sum_tokens
        |  FROM p GROUP BY bucket)
        |SELECT bucket, n_docs, n_seqs, sum_tokens,
        |  n_seqs * 256 AS capacity,
        |  n_seqs * 256 - sum_tokens AS waste,
        |  sum_tokens * 1000000 // (n_seqs * 256) AS efficiency_ppm
        |FROM a ORDER BY bucket""".stripMargin,

    // n_chars is non-negative in the fixtures, so `//` equals the
    // engine's `div` bucketing
    "q_k_anonymity" ->
      """WITH d AS (SELECT doc_id, source, lang,
        |    CAST(n_chars // 100 AS BIGINT) AS len_bucket FROM documents),
        |g AS (SELECT source, lang, len_bucket,
        |    CAST(count(*) AS BIGINT) AS group_size
        |  FROM d GROUP BY 1, 2, 3)
        |SELECT d.doc_id, d.source, d.lang, d.len_bucket, g.group_size,
        |  g.group_size < 5 AS suppressed
        |FROM d JOIN g USING (source, lang, len_bucket)
        |ORDER BY doc_id""".stripMargin,

    // starts = 0, 48, 96, … < n_tokens, keeping a tail start only if it
    // contributes tokens beyond the previous chunk (start + 16 < n).
    "q_chunk_docs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents WHERE doc_id < 100),
        |st AS (SELECT doc_id, w, unnest(list_filter(
        |    range(0, greatest(len(w), 1), 48),
        |    s -> s = 0 OR s + 16 < len(w))) AS start
        |  FROM toks)
        |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
        |  CAST(start AS BIGINT) AS start,
        |  CAST(least(64, len(w) - start) AS BIGINT) AS n_tokens,
        |  array_to_string(w[start+1:start+64], ' ') AS chunk_text
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    "q_strip_spans" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM d),
        |tok AS (SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
        |    i -> struct_pack(pos := i - 1, tok := w[i]))) AS t FROM toks),
        |flat AS (SELECT doc_id, t.pos AS pos, t.tok AS tok FROM tok),
        |grams AS (SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> struct_pack(gpos := i - 1,
        |      g := w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM toks),
        |gflat AS (SELECT doc_id, s.gpos AS gpos, s.g AS g FROM grams),
        |shared AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
        |    FROM gflat GROUP BY g) WHERE nd > 1),
        |covered AS (SELECT DISTINCT doc_id, gpos + u AS pos
        |  FROM gflat JOIN shared USING (g), unnest(range(0, 3)) AS t(u)),
        |kept AS (SELECT f.doc_id, f.pos, f.tok FROM flat f
        |  LEFT JOIN covered c ON c.doc_id = f.doc_id AND c.pos = f.pos
        |  WHERE c.doc_id IS NULL),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    array_to_string(list(tok ORDER BY pos), ' ') AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |  COALESCE(a.n_kept, 0) AS n_kept,
        |  COALESCE(a.clean_text, '') AS clean_text
        |FROM d LEFT JOIN agg a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_corpus_diff" ->
      """WITH prev AS (SELECT doc_id, md5(text) AS h FROM documents
        |  WHERE doc_id < 480),
        |nxt AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 50 = 0 THEN text || ' v2' ELSE text END) AS h
        |  FROM documents WHERE doc_id >= 20)
        |SELECT COALESCE(p.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN p.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN p.h = n.h THEN 'unchanged' ELSE 'changed' END AS status
        |FROM prev p FULL OUTER JOIN nxt n ON p.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // same shard assignment as q_pack_shards' oracle; checksum = decimal
    // sum of the 52-bit md5 bucket folded mod 2^63-1 to BIGINT (exact,
    // and BIGINT canonicalizes identically in both engines — DuckDB's
    // HUGEINT-backed decimal and Spark's decimal do not).
    "q_shard_manifest" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(text), 20, 13))::BIGINT AS ck
        |  FROM documents),
        |p AS (SELECT doc_id, n_tokens, ck,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // 5000 AS BIGINT) AS shard_id FROM d)
        |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id,
        |  CAST(sum(ck) % 9223372036854775807 AS BIGINT) AS content_checksum
        |FROM p GROUP BY shard_id ORDER BY shard_id""".stripMargin,

    // same 60-bit md5 ppm bucket as stratifiedSample's oracle.
    "q_sample_epochs" ->
      """WITH d AS (SELECT doc_id, source,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))::BIGINT
        |      % 1000000 AS b,
        |    CASE source WHEN 'src0' THEN 2500000 WHEN 'src1' THEN 1000000
        |      WHEN 'src2' THEN 400000 ELSE 0 END AS r
        |  FROM documents),
        |c AS (SELECT doc_id, source,
        |    r // 1000000 + CASE WHEN b < r % 1000000 THEN 1 ELSE 0 END AS n
        |  FROM d)
        |SELECT doc_id, source, CAST(unnest(range(0, n)) AS BIGINT) AS epoch
        |FROM c WHERE n > 0 ORDER BY doc_id, epoch""".stripMargin,

    // same 52-bit md5 bucket as the operator; rank = (bucket, doc_id).
    "q_domain_cap" ->
      """WITH h AS (SELECT source, doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 20, 13))::BIGINT AS b
        |  FROM documents),
        |r AS (SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source ORDER BY b, doc_id) AS sample_rank FROM h)
        |SELECT source, CAST(sample_rank AS BIGINT) AS sample_rank, doc_id
        |FROM r WHERE sample_rank <= 20 ORDER BY source, sample_rank""".stripMargin,

    "q_ngram_stats" ->
      """WITH toks AS (SELECT source, doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |sh AS (SELECT source, doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM toks)
        |SELECT source,
        |  CAST(count(DISTINCT s) AS BIGINT) AS distinct_trigrams,
        |  CAST(count(*) AS BIGINT) AS doc_trigram_rows
        |FROM sh GROUP BY source ORDER BY source""".stripMargin,

    "q_source_overlap" ->
      """WITH g AS (SELECT DISTINCT lang AS grp, gram FROM (
        |    SELECT lang, unnest(list_transform(
        |      range(1, greatest(len(w) - 1, 1)),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        |    FROM (SELECT lang, string_split(text, ' ') AS w FROM documents))),
        |sizes AS (SELECT grp, CAST(count(*) AS BIGINT) AS n
        |  FROM g GROUP BY grp),
        |pairs AS (SELECT s1.grp AS grp_a, s2.grp AS grp_b,
        |    s1.n AS n_a, s2.n AS n_b
        |  FROM sizes s1 JOIN sizes s2 ON s1.grp < s2.grp),
        |common AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.grp < b.grp
        |  GROUP BY a.grp, b.grp)
        |SELECT p.grp_a, p.grp_b, p.n_a, p.n_b,
        |  CAST(COALESCE(c.c, 0) AS BIGINT) AS n_common,
        |  CAST(COALESCE(c.c, 0) AS DOUBLE) / CAST(p.n_a AS DOUBLE)
        |    AS containment_a,
        |  CAST(COALESCE(c.c, 0) AS DOUBLE) / CAST(p.n_b AS DOUBLE)
        |    AS containment_b,
        |  CAST(COALESCE(c.c, 0) AS DOUBLE)
        |    / CAST(p.n_a + p.n_b - COALESCE(c.c, 0) AS DOUBLE) AS jaccard
        |FROM pairs p LEFT JOIN common c USING (grp_a, grp_b)
        |ORDER BY grp_a, grp_b""".stripMargin,

    // expression trees mirror Retrieval.bm25 node for node (left-assoc
    // arithmetic, (b·dl)/avgdl grouping, ordered list fold) for bitwise
    // double parity.
    "q_bm25" ->
      """WITH tok AS (SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '')) AS token
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |  FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |avg_dl AS (SELECT CAST((SELECT COALESCE(sum(dl), 0) FROM dl) AS DOUBLE)
        |    / (SELECT n FROM n) AS avgdl),
        |td AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok WHERE token IN ('spark', 'shuffle', 'partition')
        |  GROUP BY 1, 2),
        |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS dfr,
        |    ln((CAST(((SELECT n FROM n) - count(*)) AS DOUBLE) + 0.5) /
        |       (CAST(count(*) AS DOUBLE) + 0.5) + 1.0) AS idf
        |  FROM td GROUP BY token),
        |contrib AS (SELECT d.doc_id, d.token,
        |    f.idf * (CAST(d.tf AS DOUBLE) * 2.2) /
        |      (CAST(d.tf AS DOUBLE) +
        |        1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE) / s.avgdl)) AS c
        |  FROM td d
        |  JOIN dfreq f USING (token)
        |  JOIN dl l USING (doc_id), avg_dl s),
        |agg AS (SELECT doc_id,
        |    list_aggregate(list(c ORDER BY token), 'sum') AS score,
        |    CAST(count(*) AS BIGINT) AS n_terms
        |  FROM contrib GROUP BY doc_id)
        |SELECT doc_id, n_terms, score FROM agg
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "q_quantile_stats" ->
      """WITH d AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(sum(n_tokens) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_tokens,
        |  quantile_cont(n_tokens, 0.25) AS p25,
        |  quantile_cont(n_tokens, 0.50) AS p50,
        |  quantile_cont(n_tokens, 0.75) AS p75,
        |  quantile_cont(n_tokens, 0.95) AS p95
        |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "q_vocab_top" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'),
        |    x -> x != '')) AS token
        |  FROM documents
        |), td AS (
        |  SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2
        |)
        |SELECT token, CAST(SUM(tf) AS BIGINT) AS tf,
        |  CAST(COUNT(*) AS BIGINT) AS df
        |FROM td GROUP BY token ORDER BY tf DESC, token LIMIT 100""".stripMargin,

    // the first 10 BPE merges replayed as unrolled CTEs — see
    // bpeEvidenceOracle for the wrapped-symbol replace trick.
    "q_bpe_evidence" -> bpeEvidenceOracle(10),

    "q_wordpiece_evidence" -> wordpieceEvidenceOracle(10),

    // stored-block closed form: 5-byte header per ≤65535-byte block,
    // one (empty, final) block minimum.
    "q_deflate_evidence" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text))
        |    + 5 * greatest(1, (octet_length(encode(text)) + 65534) // 65535)
        |    AS BIGINT) AS deflate0_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // unigram seed table: every 2..8-length substring's exact mass
    // Σ count×len over the same word table, ranked (score desc, piece),
    // truncated to the trainer's seed budget 400×4 − |chars|.
    "q_unigram_evidence" ->
      """WITH tok AS (SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x != '')) AS w
        |  FROM documents),
        |wt AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok
        |  GROUP BY w ORDER BY n DESC, w LIMIT 100000),
        |pos AS (SELECT w, n, unnest(generate_series(1, length(w))) AS i
        |  FROM wt),
        |ch AS (SELECT count(DISTINCT substr(w, CAST(i AS INT), 1)) AS nch
        |  FROM pos),
        |sub AS (SELECT w, n, i, unnest(generate_series(2,
        |    least(8, length(w) - i + 1))) AS l FROM pos),
        |sc AS (SELECT substr(w, CAST(i AS INT), CAST(l AS INT)) AS piece,
        |    CAST(sum(n * l) AS BIGINT) AS score FROM sub GROUP BY 1),
        |rk AS (SELECT piece, score,
        |    row_number() OVER (ORDER BY score DESC, piece) AS seed_rank
        |  FROM sc)
        |SELECT CAST(seed_rank AS BIGINT) AS seed_rank, piece, score
        |FROM rk, ch WHERE seed_rank <= 1600 - ch.nch
        |ORDER BY seed_rank""".stripMargin,

    // same distinct-3-shingle CTE as q_ngram_jaccard's oracle, scored by
    // containment against the eval side.
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM toks),
        |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id < 10),
        |co AS (SELECT doc_id AS corpus_id, s FROM sh WHERE doc_id >= 10),
        |esz AS (SELECT eval_id, count(*) AS n_eval FROM ev GROUP BY 1),
        |ov AS (SELECT corpus_id, eval_id, count(*) AS overlap
        |  FROM co JOIN ev USING (s) GROUP BY 1, 2)
        |SELECT corpus_id, eval_id, CAST(overlap AS BIGINT) AS overlap,
        |  CAST(overlap AS DOUBLE) / n_eval AS containment
        |FROM ov JOIN esz USING (eval_id)
        |WHERE CAST(overlap AS DOUBLE) / n_eval >= 0.05
        |ORDER BY corpus_id, eval_id""".stripMargin,

    "q_quality_gates" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |m AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_aggregate(list_transform(w, t -> length(t)), 'sum')
        |      AS DOUBLE) / len(w) AS mean_len,
        |    CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))
        |      AS DOUBLE) / len(w) AS alpha_frac
        |  FROM s)
        |SELECT doc_id, n_words,
        |  n_words >= 50 AND n_words <= 100000 AS gate_n_words,
        |  mean_len >= 3.0 AND mean_len <= 10.0 AS gate_mean_word_len,
        |  alpha_frac >= 0.8 AS gate_alpha_frac,
        |  (n_words >= 50 AND n_words <= 100000)
        |    AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |    AND alpha_frac >= 0.8 AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_tfidf_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'),
        |    x -> x != '')) AS token
        |  FROM documents),
        |td AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT token, count(*) AS df FROM td GROUP BY 1),
        |sc AS (SELECT doc_id, token, tf, df,
        |    CAST(tf AS DOUBLE) * (SELECT count(*) FROM documents) / df
        |      AS score
        |  FROM td JOIN dfq USING (token)),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, token) AS rn FROM sc)
        |SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, score
        |FROM rk WHERE rn <= 3 ORDER BY doc_id, token""".stripMargin,

    "q_repetition" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS bg
        |  FROM s WHERE len(w) >= 2),
        |pd AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
        |agg AS (SELECT doc_id, max(c) AS top, sum(c) AS tot
        |  FROM pd GROUP BY 1)
        |SELECT s.doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
        |  1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
        |    AS dup_word_frac,
        |  COALESCE(CAST(top AS DOUBLE) / tot, 0.0) AS top_bigram_frac,
        |  COALESCE(CAST(top AS DOUBLE) / tot, 0.0) <= 0.18
        |    AS gate_repetition
        |FROM s LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,

    // one gram table for all n via cross-join with the n-list; counts
    // keyed on the portable 52-bit md5 gram hash carrying max(length)
    // (mirrors the engine's hash-keyed exchange — the gram string never
    // shuffles); argmax by (count desc, hash asc) via row_number;
    // duplicated-gram char sums per (doc, n); HUGEINT-widened ppm
    // mirrors the engine's DECIMAL(38,0)
    "q_repetition_ngrams" ->
      """WITH docs0 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (1000001, 'p q r s t p q r s t u v w x y z'),
        |    (1000002, 'w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 '
        |      || 'w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 tail'),
        |    (1000003, repeat('a ', 49) || 'a')) p(doc_id, text)),
        |s AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |    string_split(text, ' ') AS w FROM docs0),
        |g AS (SELECT doc_id, n,
        |    array_to_string(w[i:i+n-1], ' ') AS gram
        |  FROM s, (VALUES (2),(3),(4),(5),(10)) nn(n),
        |    unnest(range(1, len(w) - n + 2)) t(i)
        |  WHERE len(w) >= n),
        |c AS (SELECT doc_id, n,
        |    ('0x' || substr(md5(gram), 20, 13))::BIGINT AS h,
        |    count(*) AS c, max(length(gram)) AS glen
        |  FROM g GROUP BY 1, 2, 3),
        |tops AS (SELECT doc_id, n,
        |    c * glen AS topchars,
        |    row_number() OVER (PARTITION BY doc_id, n
        |      ORDER BY c DESC, h ASC) AS rn FROM c),
        |pern AS (SELECT c.doc_id, c.n,
        |    max(t.topchars) AS topchars,
        |    sum(CASE WHEN c.c >= 2 THEN c.c * c.glen
        |      ELSE 0 END) AS dupchars
        |  FROM c JOIN tops t ON c.doc_id = t.doc_id AND c.n = t.n
        |    AND t.rn = 1
        |  GROUP BY 1, 2),
        |piv AS (SELECT s.doc_id, s.n_chars,
        |    COALESCE(max(CASE WHEN n = 2 THEN topchars END), 0) AS tc2,
        |    COALESCE(max(CASE WHEN n = 3 THEN topchars END), 0) AS tc3,
        |    COALESCE(max(CASE WHEN n = 4 THEN topchars END), 0) AS tc4,
        |    COALESCE(max(CASE WHEN n = 5 THEN dupchars END), 0) AS dc5,
        |    COALESCE(max(CASE WHEN n = 10 THEN dupchars END), 0) AS dc10
        |  FROM s LEFT JOIN pern ON s.doc_id = pern.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_id, n_chars,
        |  CAST(CAST(tc2 AS HUGEINT) * 1000000
        |    // greatest(n_chars, 1) AS BIGINT) AS top2_ppm,
        |  CAST(CAST(tc3 AS HUGEINT) * 1000000
        |    // greatest(n_chars, 1) AS BIGINT) AS top3_ppm,
        |  CAST(CAST(tc4 AS HUGEINT) * 1000000
        |    // greatest(n_chars, 1) AS BIGINT) AS top4_ppm,
        |  CAST(CAST(dc5 AS HUGEINT) * 1000000
        |    // greatest(n_chars, 1) AS BIGINT) AS dup5_ppm,
        |  CAST(CAST(dc10 AS HUGEINT) * 1000000
        |    // greatest(n_chars, 1) AS BIGINT) AS dup10_ppm,
        |  (CAST(CAST(tc2 AS HUGEINT) * 1000000
        |      // greatest(n_chars, 1) AS BIGINT) <= 200000
        |    AND CAST(CAST(tc3 AS HUGEINT) * 1000000
        |      // greatest(n_chars, 1) AS BIGINT) <= 180000
        |    AND CAST(CAST(tc4 AS HUGEINT) * 1000000
        |      // greatest(n_chars, 1) AS BIGINT) <= 160000
        |    AND CAST(CAST(dc5 AS HUGEINT) * 1000000
        |      // greatest(n_chars, 1) AS BIGINT) <= 150000
        |    AND CAST(CAST(dc10 AS HUGEINT) * 1000000
        |      // greatest(n_chars, 1) AS BIGINT) <= 100000)
        |    AS gate_ngram_rep
        |FROM piv ORDER BY doc_id""".stripMargin,

    // same inline fixture via chr(10) concatenation; per-unit counts,
    // duplicate-beyond-first char sums, HUGEINT-widened ppm
    "q_repetition_lines" ->
      """WITH docs0 AS (SELECT * FROM (VALUES
        |  (1, 'alpha' || chr(10) || 'beta' || chr(10) || 'alpha'
        |    || chr(10) || 'gamma'),
        |  (2, 'para one' || chr(10) || chr(10) || 'para two'
        |    || chr(10) || chr(10) || 'para one'),
        |  (3, 'clean' || chr(10) || 'text' || chr(10) || 'here'),
        |  (4, 'x' || chr(10) || 'x' || chr(10) || 'x' || chr(10) || 'x'),
        |  (5, 'single line, no breaks')) t(doc_id, text)),
        |occ AS (
        |  SELECT doc_id, 'line' AS u, unnest(string_split(text, chr(10)))
        |    AS v FROM docs0
        |  UNION ALL
        |  SELECT doc_id, 'para' AS u,
        |    unnest(string_split(text, chr(10) || chr(10))) AS v FROM docs0),
        |c AS (SELECT doc_id, u, v, count(*) AS c,
        |    CAST(length(v) AS BIGINT) AS len
        |  FROM occ GROUP BY 1, 2, 3),
        |peru AS (SELECT doc_id, u, CAST(sum(c) AS BIGINT) AS n_units,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum((c - 1) * len) AS BIGINT) AS dup_chars,
        |    CAST(sum(c * len) AS BIGINT) AS tot_chars
        |  FROM c GROUP BY 1, 2),
        |piv AS (SELECT doc_id,
        |    COALESCE(max(CASE WHEN u = 'line' THEN n_units END), 0)
        |      AS n_lines,
        |    COALESCE(max(CASE WHEN u = 'line'
        |      THEN n_units - n_distinct END), 0) AS dl,
        |    COALESCE(max(CASE WHEN u = 'line' THEN dup_chars END), 0)
        |      AS dlc,
        |    COALESCE(max(CASE WHEN u = 'line' THEN tot_chars END), 0)
        |      AS ltc,
        |    COALESCE(max(CASE WHEN u = 'para' THEN n_units END), 0)
        |      AS n_paras,
        |    COALESCE(max(CASE WHEN u = 'para'
        |      THEN n_units - n_distinct END), 0) AS dp,
        |    COALESCE(max(CASE WHEN u = 'para' THEN dup_chars END), 0)
        |      AS dpc,
        |    COALESCE(max(CASE WHEN u = 'para' THEN tot_chars END), 0)
        |      AS ptc
        |  FROM peru GROUP BY 1)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_lines,
        |  dl * 1000000 // greatest(n_lines, 1) AS dup_line_ppm,
        |  CAST(CAST(dlc AS HUGEINT) * 1000000
        |    // greatest(ltc, 1) AS BIGINT) AS dup_line_char_ppm,
        |  n_paras,
        |  dp * 1000000 // greatest(n_paras, 1) AS dup_para_ppm,
        |  CAST(CAST(dpc AS HUGEINT) * 1000000
        |    // greatest(ptc, 1) AS BIGINT) AS dup_para_char_ppm,
        |  (dl * 1000000 // greatest(n_lines, 1) <= 300000
        |    AND dp * 1000000 // greatest(n_paras, 1) <= 300000
        |    AND CAST(CAST(dlc AS HUGEINT) * 1000000
        |      // greatest(ltc, 1) AS BIGINT) <= 200000
        |    AND CAST(CAST(dpc AS HUGEINT) * 1000000
        |      // greatest(ptc, 1) AS BIGINT) <= 200000) AS gate_line_rep
        |FROM piv ORDER BY doc_id""".stripMargin,

    "q_pii_scrub" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g'),
        |    '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g') AS scrubbed
        |FROM (VALUES
        |  (1, 'contact us at support@example.com or sales@firm.co.uk today'),
        |  (2, 'call 555-123-4567 or 555.987.6543 x89'),
        |  (3, 'server at 192.168.1.1 and 10.0.0.255 responded'),
        |  (4, 'no pii here, just text'),
        |  (5, 'mixed: a@b.io from 127.0.0.1 dialed 800-555-0199'))
        |t(doc_id, text)
        |ORDER BY doc_id""".stripMargin,

    "q_coverage_pick" -> coverageOracle(5),

    // both gates rebuilt from their proven oracle bodies; po/pe/kappa
    // derive from the exact counts in a nested select (no alias refs).
    "q_gate_agreement" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |m AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_aggregate(list_transform(w, t -> length(t)), 'sum')
        |      AS DOUBLE) / len(w) AS mean_len,
        |    CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))
        |      AS DOUBLE) / len(w) AS alpha_frac
        |  FROM s),
        |gates AS (SELECT doc_id,
        |    (n_words >= 50 AND n_words <= 100000)
        |      AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |      AND alpha_frac >= 0.8 AS a
        |  FROM m),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS bg
        |  FROM s WHERE len(w) >= 2),
        |pd AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
        |agg AS (SELECT doc_id, max(c) AS top, sum(c) AS tot
        |  FROM pd GROUP BY 1),
        |rep AS (SELECT s.doc_id,
        |    COALESCE(CAST(top AS DOUBLE) / tot, 0.0) <= 0.18 AS b
        |  FROM s LEFT JOIN agg USING (doc_id)),
        |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n10,
        |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n01,
        |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n00
        |  FROM gates JOIN rep USING (doc_id)),
        |d AS (SELECT n, n11, n10, n01, n00,
        |    (n11 + n00) / n AS po,
        |    ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10))
        |      / (n * n) AS pe
        |  FROM cnt)
        |SELECT n, n11, n10, n01, n00, po, pe,
        |  (po - pe) / (1.0 - pe) AS kappa
        |FROM d""".stripMargin,

    // same doubled-median rank selection; (n+1)//2 and (n+2)//2 pick the
    // middle of the sorted multiset regardless of tie order.
    "q_mad_outliers" ->
      """WITH base AS (SELECT source AS g, doc_id AS id,
        |    CAST(len(string_split(text, ' ')) AS DECIMAL(18,4)) AS x
        |  FROM documents),
        |r AS (SELECT g, id, x,
        |    row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM base),
        |m AS (SELECT g, CAST(sum(x) * (3 - count(*)) AS DECIMAL(38,4))
        |    AS med2
        |  FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY g),
        |d AS (SELECT b.g, b.id, b.x, m.med2,
        |    abs(2 * b.x - m.med2) AS dev2
        |  FROM base b JOIN m USING (g)),
        |r2 AS (SELECT g, id, x, med2, dev2,
        |    row_number() OVER (PARTITION BY g ORDER BY dev2) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM d),
        |m2 AS (SELECT g, CAST(sum(dev2) * (3 - count(*)) AS DECIMAL(38,4))
        |    AS mad4
        |  FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY g)
        |SELECT d.g AS source, d.id AS doc_id,
        |  CAST(d.x AS DOUBLE) AS val, CAST(d.med2 AS DOUBLE) AS med2,
        |  CAST(d.dev2 AS DOUBLE) AS dev2, CAST(m2.mad4 AS DOUBLE) AS mad4,
        |  2 * d.dev2 > 3 * m2.mad4 AS is_outlier
        |FROM d JOIN m2 USING (g)
        |ORDER BY source, doc_id""".stripMargin,

    // Luhn mod-10 replayed digit-by-digit in SQL: from the RIGHT, odd
    // positions as-is, even positions doubled (minus 9 above 9) — the
    // integer sum is compared bitwise, the boolean is derived from it.
    "q_luhn_cards" ->
      """WITH docs(doc_id, text) AS (VALUES
        |  (1, 'pay 4111 1111 1111 1111 or 5555-5555-5555-4444 now'),
        |  (2, 'order id 1234567890123456 shipped to 4012888888881881'),
        |  (3, 'amex 378282246310005 and bogus 4111111111111112'),
        |  (4, 'call 555-123-4567, no cards'),
        |  (5, 'long run 12345678901234567890 ignored')),
        |cand AS (SELECT doc_id, unnest(regexp_extract_all(text,
        |    '\b(?:[0-9][ -]?){12,18}[0-9]\b')) AS raw FROM docs),
        |d AS (SELECT doc_id, raw,
        |    replace(replace(raw, ' ', ''), '-', '') AS digits FROM cand),
        |l AS (SELECT doc_id, raw, digits, reverse(digits) AS r FROM d),
        |s AS (SELECT doc_id, raw, digits,
        |    CAST(list_aggregate(list_transform(range(1, length(r) + 1), i ->
        |      CASE WHEN i % 2 = 1
        |        THEN CAST(substr(r, CAST(i AS INTEGER), 1) AS INTEGER)
        |        ELSE CASE
        |          WHEN CAST(substr(r, CAST(i AS INTEGER), 1) AS INTEGER) * 2 > 9
        |          THEN CAST(substr(r, CAST(i AS INTEGER), 1) AS INTEGER) * 2 - 9
        |          ELSE CAST(substr(r, CAST(i AS INTEGER), 1) AS INTEGER) * 2
        |        END END), 'sum') AS BIGINT) AS luhn_sum
        |  FROM l)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, raw, digits,
        |  CAST(length(digits) AS BIGINT) AS n_digits, luhn_sum,
        |  length(digits) BETWEEN 13 AND 19 AND luhn_sum % 10 = 0 AS is_valid
        |FROM s ORDER BY doc_id, raw""".stripMargin,

    // same candidate regex + Luhn gate; redaction = list_reduce fold with
    // the original text prepended as the accumulator seed.
    "q_card_scrub" ->
      """WITH docs(doc_id, text) AS (VALUES
        |  (1, 'pay 4111 1111 1111 1111 or 5555-5555-5555-4444 now'),
        |  (2, 'order id 1234567890123456 shipped to 4012888888881881'),
        |  (3, 'amex 378282246310005 and bogus 4111111111111112'),
        |  (4, 'call 555-123-4567, no cards'),
        |  (5, 'long run 12345678901234567890 ignored'))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  list_reduce(list_prepend(text,
        |    list_filter(regexp_extract_all(text,
        |        '\b(?:[0-9][ -]?){12,18}[0-9]\b'),
        |      c -> length(replace(replace(c, ' ', ''), '-', ''))
        |          BETWEEN 13 AND 19
        |        AND list_aggregate(list_transform(
        |            range(1, length(replace(replace(c, ' ', ''), '-', '')) + 1),
        |            i -> CASE WHEN i % 2 = 1
        |              THEN CAST(substr(reverse(replace(replace(c, ' ', ''),
        |                '-', '')), CAST(i AS INTEGER), 1) AS INTEGER)
        |              ELSE CASE
        |                WHEN CAST(substr(reverse(replace(replace(c, ' ', ''),
        |                  '-', '')), CAST(i AS INTEGER), 1) AS INTEGER) * 2 > 9
        |                THEN CAST(substr(reverse(replace(replace(c, ' ', ''),
        |                  '-', '')), CAST(i AS INTEGER), 1) AS INTEGER) * 2 - 9
        |                ELSE CAST(substr(reverse(replace(replace(c, ' ', ''),
        |                  '-', '')), CAST(i AS INTEGER), 1) AS INTEGER) * 2
        |              END END), 'sum') % 10 = 0)),
        |    (acc, x) -> replace(acc, x, '<CARD>')) AS scrubbed
        |FROM docs ORDER BY doc_id""".stripMargin,

    "q_token_stats" ->
      """SELECT doc_id,
        |  length(text) AS n_chars_actual,
        |  len(string_split(text, ' ')) AS n_tokens_ws,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_re
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id, length(text) AS len,
        |  CAST(list_aggregate(list_transform(string_split(text, ' '),
        |      t -> length(t)), 'sum') AS DOUBLE)
        |    / len(string_split(text, ' ')) AS mean_token_len,
        |  CAST(len(regexp_extract_all(text,
        |      '[\.,;:!\?''"()\[\]{}-]')) AS DOUBLE) / length(text) AS punct_ratio,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t IN
        |      ('the','and','of','to','in','is','it','that','was','for'))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH scored AS (SELECT doc_id,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('the','and','of','to','in','is','it','that','was','for'))) AS s_en,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('el','la','de','que','y','en','un','los','se','por'))) AS s_es,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('der','die','und','das','ist','nicht','ein','mit','zu','den'))) AS s_de,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('le','la','les','et','des','un','une','du','est','dans'))) AS s_fr,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('的','了','是','我','不','在','有','人','这','他'))) AS s_zh
        |FROM documents)
        |SELECT doc_id, s_en, s_es, s_de, s_fr, s_zh,
        |  CASE
        |    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |    WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |    WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS predicted
        |FROM scored ORDER BY doc_id""".stripMargin,

    // the q_lang_id prediction CASE, folded to the confusion matrix
    // with windowed per-label totals and diagonal-only integral recall
    "q_langid_confusion" ->
      """WITH scored AS (SELECT doc_id, lang,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('the','and','of','to','in','is','it','that','was','for'))) AS s_en,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('el','la','de','que','y','en','un','los','se','por'))) AS s_es,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('der','die','und','das','ist','nicht','ein','mit','zu','den'))) AS s_de,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('le','la','les','et','des','un','une','du','est','dans'))) AS s_fr,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('的','了','是','我','不','在','有','人','这','他'))) AS s_zh
        |FROM documents),
        |pred AS (SELECT lang,
        |  CASE
        |    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |    WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |    WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS predicted
        |FROM scored),
        |m AS (SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
        |  FROM pred GROUP BY lang, predicted)
        |SELECT lang, predicted, n,
        |  CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_labeled,
        |  CASE WHEN lang = predicted THEN CAST(n * 1000000
        |    // sum(n) OVER (PARTITION BY lang) AS BIGINT) END AS recall_ppm
        |FROM m ORDER BY lang, predicted""".stripMargin,

    "q_text_clean" ->
      """WITH d(id, raw) AS (VALUES
        |  (1, '<html><b>Annual  report</b> for <i>ACME</i>.</html>'),
        |  (2, 'plain text, no markup'),
        |  (3, '<p>x</p>'),
        |  (4, 'ab')),
        |c AS (SELECT id, trim(regexp_replace(regexp_replace(
        |    raw, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS clean FROM d)
        |SELECT CAST(id AS BIGINT) AS id, clean,
        |  CAST(len(list_distinct(list_transform(
        |    range(1, greatest(length(clean) - 3, 0) + 1),
        |    i -> substr(clean, i, 4)))) AS BIGINT) AS n_shingles,
        |  CASE WHEN length(clean) >= 4 THEN substr(clean, 1, 4) END
        |    AS first_shingle
        |FROM c ORDER BY id""".stripMargin,

    "q_corpus_prep" ->
      """WITH keepers AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |scored AS (SELECT d.doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('the','and','of','to','in','is','it','that','was','for'))) AS s_en,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('el','la','de','que','y','en','un','los','se','por'))) AS s_es,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('der','die','und','das','ist','nicht','ein','mit','zu','den'))) AS s_de,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('le','la','les','et','des','un','une','du','est','dans'))) AS s_fr,
        |  len(list_filter(string_split(text,' '), t -> t IN
        |    ('的','了','是','我','不','在','有','人','这','他'))) AS s_zh
        |FROM documents d JOIN keepers k ON d.doc_id = k.doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(s_en AS DOUBLE) / n_tokens AS stopword_ratio
        |FROM scored
        |WHERE s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh
        |  AND n_tokens >= 30 AND CAST(s_en AS DOUBLE) / n_tokens >= 0.02
        |ORDER BY doc_id""".stripMargin,

    // stage flags replay q_corpus_prep's gates (dedup window, stopword
    // language argmax, length+stopword quality) plus q_repetition's
    // top-bigram gate; the ledger is pure exact-integer counting over
    // the first-failing-stage distribution.
    "q_attrition_ledger" ->
      """WITH w0 AS (SELECT doc_id, text, string_split(text, ' ') AS w,
        |    min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
        |  FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS bg
        |  FROM w0 WHERE len(w) >= 2),
        |pd AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
        |rep AS (SELECT doc_id, max(c) AS top, sum(c) AS tot
        |  FROM pd GROUP BY 1),
        |sc AS (SELECT doc_id, keeper, len(w) AS n_tokens,
        |  len(list_filter(w, t -> t IN
        |    ('the','and','of','to','in','is','it','that','was','for'))) AS s_en,
        |  len(list_filter(w, t -> t IN
        |    ('el','la','de','que','y','en','un','los','se','por'))) AS s_es,
        |  len(list_filter(w, t -> t IN
        |    ('der','die','und','das','ist','nicht','ein','mit','zu','den'))) AS s_de,
        |  len(list_filter(w, t -> t IN
        |    ('le','la','les','et','des','un','une','du','est','dans'))) AS s_fr,
        |  len(list_filter(w, t -> t IN
        |    ('的','了','是','我','不','在','有','人','这','他'))) AS s_zh
        |  FROM w0),
        |fl AS (SELECT sc.doc_id,
        |    (sc.doc_id = keeper) AS f0,
        |    (s_en >= s_es AND s_en >= s_de AND s_en >= s_fr
        |      AND s_en >= s_zh) AS f1,
        |    (n_tokens >= 30
        |      AND CAST(s_en AS DOUBLE) / n_tokens >= 0.02) AS f2,
        |    (COALESCE(CAST(top AS DOUBLE) / tot, 0.0) <= 0.18) AS f3
        |  FROM sc LEFT JOIN rep ON sc.doc_id = rep.doc_id),
        |ff AS (SELECT CASE WHEN NOT f0 THEN 0 WHEN NOT f1 THEN 1
        |    WHEN NOT f2 THEN 2 WHEN NOT f3 THEN 3 ELSE 4 END AS ff
        |  FROM fl),
        |drops AS (SELECT ff, count(*) AS n FROM ff GROUP BY ff),
        |tot2 AS (SELECT sum(n) AS total FROM drops),
        |stages AS (SELECT * FROM (VALUES (0, 'exact_dedup'),
        |  (1, 'language'), (2, 'quality'),
        |  (3, 'repetition')) t(stage_id, stage)),
        |led AS (SELECT stage_id, stage, COALESCE(d.n, 0) AS n_dropped
        |  FROM stages LEFT JOIN drops d ON d.ff = stages.stage_id)
        |SELECT CAST(stage_id AS BIGINT) AS stage_id, stage,
        |  CAST(total - COALESCE(sum(n_dropped) OVER (ORDER BY stage_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS n_in,
        |  CAST(total - COALESCE(sum(n_dropped) OVER (ORDER BY stage_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    - n_dropped AS BIGINT) AS n_kept,
        |  CAST(n_dropped AS BIGINT) AS n_dropped
        |FROM led CROSS JOIN tot2
        |ORDER BY stage_id""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id,
        |  CAST(list_aggregate(list_transform(string_split(text, ' '),
        |    (t, i) -> (CAST(i AS BIGINT) * 1000003
        |               * (length(t) * 131 + ascii(t[1]) * 7 + ascii(right(t, 1))))
        |              % 1000000007), 'sum') % 1000000007 AS BIGINT) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies,
        |  md5(text) AS content_hash
        |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin,

    "q_multimodal_frames" ->
      """WITH d AS (SELECT doc_id, text,
        |  greatest(CAST(ceil(length(text) / 64.0) AS INT), 1) AS n
        |FROM documents WHERE doc_id < 50)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_id,
        |  CAST(length(substr(text, i * 64 + 1, 64)) AS BIGINT) AS frame_len,
        |  substr(text, i * 64 + 1, 64) AS frame_text
        |FROM d, unnest(generate_series(0, n - 1)) t(i)
        |ORDER BY doc_id, frame_id""".stripMargin,

    // the decoded pixel intensities must equal the ascii codes of the
    // md5 hex — DuckDB computes them without any image library, so the
    // lossless PNG round-trip in Spark is what a hash match certifies.
    "q_multimodal_decode" ->
      """WITH px AS (SELECT doc_id,
        |    ascii(substr(md5(text), CAST(i AS INT), 1)) AS v
        |  FROM documents, unnest(generate_series(1, 32)) t(i)
        |  WHERE doc_id < 200)
        |SELECT doc_id, TRUE AS decoded,
        |  CAST(8 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
        |  CAST(count(*) AS BIGINT) AS n_pixels,
        |  CAST(sum(v) AS BIGINT) AS sum_intensity,
        |  CAST(min(v) AS BIGINT) AS min_intensity,
        |  CAST(max(v) AS BIGINT) AS max_intensity
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // JPEG is lossy, so the certificate is: geometry exact, source sum
    // exact (md5 ascii), decode error inside the fixed bound → TRUE.
    // CODEC ASSUMPTION: the bounds (max_pix_err<=2, sum_err<=16) are
    // calibrated against the stock JDK ImageIO JPEG codec (measured
    // <=1/<=5). A JDK vendor change or an ImageIO plugin on the
    // classpath (e.g. TwelveMonkeys) can shift decode error — a red
    // here after an environment change means codec swap, not an
    // operator regression; re-measure and re-calibrate the bound.
    "q_multimodal_jpeg" ->
      """WITH px AS (SELECT doc_id,
        |    ascii(substr(md5(text), CAST(i AS INT), 1)) AS v
        |  FROM documents, unnest(generate_series(1, 32)) t(i)
        |  WHERE doc_id < 200)
        |SELECT doc_id, TRUE AS decoded,
        |  CAST(8 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
        |  CAST(count(*) AS BIGINT) AS n_pixels,
        |  CAST(sum(v) AS BIGINT) AS src_sum,
        |  TRUE AS pix_err_ok, TRUE AS sum_err_ok
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mux→demux→decode must recover both frames with exact geometry and
    // bounded decode error; src sums are the md5 / md5∘md5 ascii sums.
    "q_multimodal_video_real" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h0, md5(md5(text)) AS h1
        |  FROM documents WHERE doc_id < 200),
        |f AS (SELECT doc_id, 0 AS frame_id, h0 AS hx FROM h
        |  UNION ALL SELECT doc_id, 1 AS frame_id, h1 AS hx FROM h),
        |px AS (SELECT doc_id, frame_id,
        |    ascii(substr(hx, CAST(i AS INT), 1)) AS v
        |  FROM f, unnest(generate_series(1, 32)) t(i))
        |SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
        |  TRUE AS decoded,
        |  CAST(8 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
        |  CAST(count(*) AS BIGINT) AS n_pixels,
        |  CAST(sum(v) AS BIGINT) AS src_sum,
        |  TRUE AS pix_err_ok, TRUE AS sum_err_ok
        |FROM px GROUP BY doc_id, frame_id
        |ORDER BY doc_id, frame_id""".stripMargin,

    // decoded PCM sample values must equal the md5 hex ascii codes —
    // the WAVE round-trip certificate, like q_multimodal_decode's.
    "q_multimodal_audio" ->
      """WITH sm AS (SELECT doc_id,
        |    ascii(substr(md5(text), CAST(i AS INT), 1)) AS v
        |  FROM documents, unnest(generate_series(1, 32)) t(i)
        |  WHERE doc_id < 200)
        |SELECT doc_id, TRUE AS decoded,
        |  CAST(8000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sum_sample,
        |  CAST(min(v) AS BIGINT) AS min_sample,
        |  CAST(max(v) AS BIGINT) AS max_sample
        |FROM sm GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // two frames per doc: md5(text) and md5(md5(text)) hex ascii codes.
    "q_multimodal_video" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h0, md5(md5(text)) AS h1
        |  FROM documents WHERE doc_id < 200),
        |fr AS (SELECT doc_id, 0 AS f, h0 AS hx FROM h
        |  UNION ALL SELECT doc_id, 1 AS f, h1 AS hx FROM h),
        |px AS (SELECT doc_id, f,
        |    ascii(substr(hx, CAST(i AS INT), 1)) AS v
        |  FROM fr, unnest(generate_series(1, 32)) t(i))
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_id,
        |  CAST(8 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
        |  CAST(count(*) AS BIGINT) AS n_pixels,
        |  CAST(sum(v) AS BIGINT) AS sum_intensity,
        |  CAST(min(v) AS BIGINT) AS min_intensity,
        |  CAST(max(v) AS BIGINT) AS max_intensity
        |FROM px GROUP BY doc_id, f ORDER BY doc_id, frame_id""".stripMargin,

    // nearest-neighbor 8×4 → 4×2 keeps src pixels (2x, 2y): hex
    // positions {1,3,5,7,17,19,21,23} (1-based) survive the resample.
    "q_multimodal_resize" ->
      """WITH px AS (SELECT doc_id,
        |    ascii(substr(md5(text), CAST(i AS INT), 1)) AS v
        |  FROM documents, unnest([1,3,5,7,17,19,21,23]) t(i)
        |  WHERE doc_id < 200)
        |SELECT doc_id, TRUE AS decoded,
        |  CAST(4 AS BIGINT) AS width, CAST(2 AS BIGINT) AS height,
        |  CAST(count(*) AS BIGINT) AS n_pixels,
        |  CAST(sum(v) AS BIGINT) AS sum_intensity,
        |  CAST(min(v) AS BIGINT) AS min_intensity,
        |  CAST(max(v) AS BIGINT) AS max_intensity
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // samples are the md5 hex ascii codes; window w covers positions
    // [8w+1, 8w+8] of the hex string (32 samples → 4 windows).
    "q_multimodal_energy" ->
      """WITH sm AS (SELECT doc_id, CAST((i - 1) // 8 AS BIGINT) AS window_id,
        |    CAST(ascii(substr(md5(text), CAST(i AS INT), 1)) AS BIGINT) AS v
        |  FROM documents, unnest(generate_series(1, 32)) t(i)
        |  WHERE doc_id < 200)
        |SELECT doc_id, window_id,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(v)) AS BIGINT) AS peak
        |FROM sm GROUP BY doc_id, window_id
        |ORDER BY doc_id, window_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS digest,
        |  octet_length(encode(text)) // 1024 + 1 AS n_chunks
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the oracle BRUTE-FORCES all pairs from the md5-derived pixels
    // (thumbnail (x,y) ← src (x, y//2), the nearest-neighbor rule;
    // bit = 64·v > Σv, integer-exact) — Spark's banded output matching
    // it certifies banding is lossless at the Hamming bound AND the
    // real PNG decode recovered every pixel.
    "q_image_dedup" ->
      """WITH hx0 AS (SELECT doc_id, md5(text) AS hex
        |  FROM documents WHERE doc_id < 200),
        |hx AS (SELECT doc_id*2 AS id, hex FROM hx0
        |  UNION ALL
        |  SELECT doc_id*2+1 AS id, '0' || substr(hex, 2) AS hex FROM hx0),
        |px AS (SELECT id, i, ascii(substr(hex,
        |    CAST(((i // 8) // 2) * 8 + (i % 8) + 1 AS INT), 1)) AS v
        |  FROM hx, unnest(generate_series(0, 63)) t(i)),
        |tot AS (SELECT id, sum(v) AS total FROM px GROUP BY id),
        |bits AS (SELECT px.id AS id, px.i AS i,
        |    CASE WHEN 64 * px.v > tot.total THEN 1 ELSE 0 END AS b
        |  FROM px JOIN tot ON px.id = tot.id),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
        |    sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) AS hamming
        |  FROM bits a JOIN bits b ON a.i = b.i AND a.id < b.id
        |  GROUP BY a.id, b.id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    // 9×8 thumbnail from the 8×4 md5 image: t(x,y) = hex char at
    // (y//2)*8 + (x*8)//9; bit (y*8+x) = t(x,y) > t(x+1,y) for x<8 —
    // integer-exact, brute-forced over all pairs
    "q_image_dedup_dhash" ->
      """WITH hx0 AS (SELECT doc_id, md5(text) AS hex
        |  FROM documents WHERE doc_id < 200),
        |hx AS (SELECT doc_id*2 AS id, hex FROM hx0
        |  UNION ALL
        |  SELECT doc_id*2+1 AS id, '0' || substr(hex, 2) AS hex FROM hx0),
        |px AS (SELECT id, x, y, ascii(substr(hex,
        |    CAST((y // 2) * 8 + (x * 8) // 9 AS INT) + 1, 1)) AS v
        |  FROM hx, unnest(generate_series(0, 8)) tx(x),
        |    unnest(generate_series(0, 7)) ty(y)),
        |bits AS (SELECT a.id AS id, a.y * 8 + a.x AS i,
        |    CASE WHEN a.v > b.v THEN 1 ELSE 0 END AS b
        |  FROM px a JOIN px b ON b.id = a.id AND b.y = a.y
        |    AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
        |    sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) AS hamming
        |  FROM bits a JOIN bits b ON a.i = b.i AND a.id < b.id
        |  GROUP BY a.id, b.id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    // samples are the md5-hex ASCII codes (the fingerprintWav PCM
    // contract); 65 nearest-neighbor anchors a(j) = s[(j*32)//65],
    // bit j = a(j) > a(j+1), brute-forced over ALL pairs — matching
    // Spark's banded output certifies decode parity and zero banding
    // loss at the bound.
    "q_audio_dedup" ->
      """WITH hx0 AS (SELECT doc_id, md5(text) AS hex
        |  FROM documents WHERE doc_id < 200),
        |hx AS (SELECT doc_id*2 AS id, hex FROM hx0
        |  UNION ALL
        |  SELECT doc_id*2+1 AS id, '0' || substr(hex, 2) AS hex FROM hx0),
        |anch AS (SELECT id, j, ascii(substr(hex,
        |    CAST((j * 32) // 65 AS INT) + 1, 1)) AS a
        |  FROM hx, unnest(generate_series(0, 64)) t(j)),
        |bits AS (SELECT c.id AS id, c.j AS j,
        |    CASE WHEN c.a > n.a THEN 1 ELSE 0 END AS b
        |  FROM anch c JOIN anch n ON n.id = c.id AND n.j = c.j + 1
        |  WHERE c.j < 64),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
        |    sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) AS hamming
        |  FROM bits a JOIN bits b ON a.j = b.j AND a.id < b.id
        |  GROUP BY a.id, b.id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    // frame ids are video_id·1000 + frame index, video ids doc_id·2
    // (original) / doc_id·2+1 (one hex position rewritten in both
    // frames); frame 0 pixels derive from md5(text), frame 1 from
    // md5(md5(text)) — same thumbnail / threshold / Hamming arithmetic
    // as q_image_dedup.
    "q_video_dedup" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h0, md5(md5(text)) AS h1
        |  FROM documents WHERE doc_id < 100),
        |v AS (SELECT doc_id*2 AS vid, h0, h1 FROM h
        |  UNION ALL
        |  SELECT doc_id*2+1 AS vid, '0' || substr(h0, 2) AS h0,
        |    '0' || substr(h1, 2) AS h1 FROM h),
        |hx AS (SELECT vid*1000 AS id, h0 AS hex FROM v
        |  UNION ALL SELECT vid*1000+1 AS id, h1 AS hex FROM v),
        |px AS (SELECT id, i, ascii(substr(hex,
        |    CAST(((i // 8) // 2) * 8 + (i % 8) + 1 AS INT), 1)) AS v
        |  FROM hx, unnest(generate_series(0, 63)) t(i)),
        |tot AS (SELECT id, sum(v) AS total FROM px GROUP BY id),
        |bits AS (SELECT px.id AS id, px.i AS i,
        |    CASE WHEN 64 * px.v > tot.total THEN 1 ELSE 0 END AS b
        |  FROM px JOIN tot ON px.id = tot.id),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
        |    sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) AS hamming
        |  FROM bits a JOIN bits b ON a.i = b.i AND a.id < b.id
        |  GROUP BY a.id, b.id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    // the full composition replayed: entities from md5(text), the three
    // channel pair sets (text equality; aHash pixels hamming ≤ 3 — the
    // q_image_dedup CTE; delta anchors hamming ≤ 1 — the q_audio_dedup
    // CTE), per-channel recursive-CC clusters + keepBest arbitration
    // (score desc, id asc), the cross-modal union's clusters, then the
    // first-failing-stage ledger unroll
    "q_corpus_prep_multimodal" ->
      """WITH RECURSIVE
        |d AS (SELECT d0.doc_id, d0.text, n.text AS ntext,
        |    md5(d0.text) AS h
        |  FROM documents d0 LEFT JOIN documents n
        |    ON n.doc_id = d0.doc_id + 1 AND n.doc_id < 200
        |  WHERE d0.doc_id < 200),
        |e0 AS (SELECT doc_id*2 AS id,
        |    CASE WHEN doc_id % 4 = 2 AND ntext IS NOT NULL
        |         THEN 'Q' || substr(ntext, 2) ELSE text END AS text
        |  FROM d),
        |e AS (SELECT id, text, md5(text) AS hex FROM e0
        |  UNION ALL
        |  SELECT doc_id*2+1 AS id,
        |    CASE WHEN doc_id % 4 = 1 THEN 'X' || substr(text, 2)
        |         WHEN doc_id % 4 = 3 THEN 'Q' || substr(text, 2)
        |         ELSE text END AS text,
        |    CASE WHEN doc_id % 4 = 0 THEN md5(text || 'alt')
        |         WHEN doc_id % 4 = 2 THEN md5(text || 'zzz')
        |         WHEN doc_id % 4 = 1
        |           THEN substr(h, 1, 16) || '0' || substr(h, 18)
        |         ELSE '0' || substr(h, 2) END AS hex
        |  FROM d),
        |sc AS (SELECT id, CAST(length(text) AS BIGINT) AS score FROM e),
        |tp AS (SELECT a.id AS u, b.id AS v FROM e a JOIN e b
        |  ON a.text = b.text AND a.id < b.id),
        |px AS (SELECT id, i, ascii(substr(hex,
        |    CAST(((i // 8) // 2) * 8 + (i % 8) + 1 AS INT), 1)) AS v
        |  FROM e, unnest(generate_series(0, 63)) t(i)),
        |tot AS (SELECT id, sum(v) AS total FROM px GROUP BY id),
        |ibits AS (SELECT px.id AS id, px.i AS i,
        |    CASE WHEN 64 * px.v > tot.total THEN 1 ELSE 0 END AS b
        |  FROM px JOIN tot ON px.id = tot.id),
        |ip AS (SELECT a.id AS u, b.id AS v
        |  FROM ibits a JOIN ibits b ON a.i = b.i AND a.id < b.id
        |  GROUP BY a.id, b.id
        |  HAVING sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) <= 3),
        |anch AS (SELECT id, j, ascii(substr(hex,
        |    CAST((j * 32) // 65 AS INT) + 1, 1)) AS a
        |  FROM e, unnest(generate_series(0, 64)) t(j)),
        |abits AS (SELECT c.id AS id, c.j AS j,
        |    CASE WHEN c.a > n.a THEN 1 ELSE 0 END AS b
        |  FROM anch c JOIN anch n ON n.id = c.id AND n.j = c.j + 1
        |  WHERE c.j < 64),
        |ap AS (SELECT a.id AS u, b.id AS v
        |  FROM abits a JOIN abits b ON a.j = b.j AND a.id < b.id
        |  GROUP BY a.id, b.id
        |  HAVING sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) <= 1),
        |cp AS (SELECT u, v FROM tp UNION SELECT u, v FROM ip
        |  UNION SELECT u, v FROM ap),
        |tpe AS (SELECT u, v FROM tp UNION SELECT v, u FROM tp),
        |tre(id, r) AS (SELECT u, u FROM tpe
        |  UNION SELECT x.u, tre.r FROM tpe x JOIN tre ON x.v = tre.id),
        |tlab AS (SELECT id, min(r) AS label FROM tre GROUP BY id),
        |tlose AS (SELECT id FROM (SELECT l.id, row_number() OVER (
        |    PARTITION BY l.label ORDER BY s.score DESC, l.id ASC) AS rk
        |  FROM tlab l JOIN sc s ON s.id = l.id) WHERE rk > 1),
        |ipe AS (SELECT u, v FROM ip UNION SELECT v, u FROM ip),
        |ire(id, r) AS (SELECT u, u FROM ipe
        |  UNION SELECT x.u, ire.r FROM ipe x JOIN ire ON x.v = ire.id),
        |ilab AS (SELECT id, min(r) AS label FROM ire GROUP BY id),
        |ilose AS (SELECT id FROM (SELECT l.id, row_number() OVER (
        |    PARTITION BY l.label ORDER BY s.score DESC, l.id ASC) AS rk
        |  FROM ilab l JOIN sc s ON s.id = l.id) WHERE rk > 1),
        |ape AS (SELECT u, v FROM ap UNION SELECT v, u FROM ap),
        |are(id, r) AS (SELECT u, u FROM ape
        |  UNION SELECT x.u, are.r FROM ape x JOIN are ON x.v = are.id),
        |alab AS (SELECT id, min(r) AS label FROM are GROUP BY id),
        |alose AS (SELECT id FROM (SELECT l.id, row_number() OVER (
        |    PARTITION BY l.label ORDER BY s.score DESC, l.id ASC) AS rk
        |  FROM alab l JOIN sc s ON s.id = l.id) WHERE rk > 1),
        |cpe AS (SELECT u, v FROM cp UNION SELECT v, u FROM cp),
        |cre(id, r) AS (SELECT u, u FROM cpe
        |  UNION SELECT x.u, cre.r FROM cpe x JOIN cre ON x.v = cre.id),
        |clab AS (SELECT id, min(r) AS label FROM cre GROUP BY id),
        |clos AS (SELECT id FROM (SELECT l.id, row_number() OVER (
        |    PARTITION BY l.label ORDER BY s.score DESC, l.id ASC) AS rk
        |  FROM clab l JOIN sc s ON s.id = l.id) WHERE rk > 1),
        |ff AS (SELECT sc.id,
        |    CASE WHEN sc.id IN (SELECT id FROM tlose) THEN 0
        |         WHEN sc.id IN (SELECT id FROM alose) THEN 1
        |         WHEN sc.id IN (SELECT id FROM ilose) THEN 2
        |         WHEN sc.id IN (SELECT id FROM clos) THEN 3
        |         ELSE 4 END AS f FROM sc),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS total FROM sc),
        |dr AS (SELECT f, CAST(count(*) AS BIGINT) AS nd FROM ff GROUP BY f),
        |st AS (SELECT * FROM (VALUES (0, 'text_exact'),
        |    (1, 'audio_near_dup'), (2, 'image_near_dup'),
        |    (3, 'cross_modal_merge')) v(stage_id, stage)),
        |led AS (SELECT st.stage_id, st.stage,
        |    (SELECT total FROM tt) - COALESCE((SELECT sum(nd) FROM dr
        |      WHERE dr.f < st.stage_id), 0) AS n_in,
        |    COALESCE((SELECT nd FROM dr WHERE dr.f = st.stage_id), 0)
        |      AS n_dropped
        |  FROM st)
        |SELECT CAST(stage_id AS BIGINT) AS stage_id, stage,
        |  CAST(n_in AS BIGINT) AS n_in,
        |  CAST(n_in - n_dropped AS BIGINT) AS n_kept,
        |  CAST(n_dropped AS BIGINT) AS n_dropped
        |FROM led ORDER BY stage_id""".stripMargin,

    "q_global_rank" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS rank
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_corpus_shuffle" ->
      """SELECT doc_id, CAST(row_number() OVER (ORDER BY
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch1'),
        |      18, 15))::BIGINT, doc_id) - 1 AS BIGINT) AS shuffle_rank
        |FROM documents ORDER BY doc_id""".stripMargin,

    // (bucket, md5 shuffle hash, doc_id) total order replayed flat
    "q_curriculum" ->
      """SELECT doc_id, CAST(n_chars // 50 AS BIGINT) AS bucket,
        |  CAST(row_number() OVER (ORDER BY n_chars // 50,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch1'),
        |      18, 15))::BIGINT, doc_id) - 1 AS BIGINT) AS curriculum_rank
        |FROM documents ORDER BY doc_id""".stripMargin,

    // pmi_ratio = (c_ab·n_tok·n_tok) / (n_pairs·c_a·c_b) with the exact
    // multiplication order of the Spark side — pure IEEE multiply/divide
    // over exact integers, so the doubles match bitwise (ln would not:
    // Java and DuckDB disagree in the last ulp).
    "q_pmi_pairs" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
        |pairs AS (SELECT unnest(flatten(list_transform(
        |    range(1, len(w) + 1), i ->
        |    list_transform(list_filter([1, 2], d -> i + d <= len(w)),
        |      d -> struct_pack(a := w[i], b := w[i + d]))))) AS p
        |  FROM toks),
        |pc AS (SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM pairs GROUP BY 1, 2),
        |uc AS (SELECT unnest(w) AS tok FROM toks),
        |u AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uc GROUP BY tok),
        |nt AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_tok FROM u),
        |np AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS n_pairs FROM pc)
        |SELECT a, b, c_ab, ua.c AS c_a, ub.c AS c_b,
        |  CAST(c_ab AS DOUBLE) * n_tok * n_tok /
        |     (CAST(n_pairs AS DOUBLE) * ua.c * ub.c) AS pmi_ratio
        |FROM pc JOIN u ua ON ua.tok = a JOIN u ub ON ub.tok = b, nt, np
        |WHERE c_ab >= 30 ORDER BY a, b""".stripMargin,

    "q_freq_spectrum" ->
      """WITH uc AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |u AS (SELECT tok, count(*) AS freq FROM uc GROUP BY tok)
        |SELECT CAST(freq AS BIGINT) AS freq,
        |  CAST(count(*) AS BIGINT) AS n_tokens
        |FROM u GROUP BY freq ORDER BY freq""".stripMargin,

    "q_heavy_hitters" ->
      """WITH uc AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |u AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM uc GROUP BY tok),
        |nt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM u)
        |SELECT tok, cnt, n_total FROM u, nt
        |WHERE CAST(cnt AS DOUBLE) >= n_total * 0.005
        |ORDER BY tok""".stripMargin,

    // same byte-variant rows rebuilt with chr(): utf8proc NFC must agree
    // with the JDK normalizer codepoint-for-codepoint.
    "q_unicode_norm" ->
      """WITH f(doc_id, txt) AS (VALUES
        |  (1, 'cafe' || chr(769) || ' combining'),
        |  (2, 'caf' || chr(233) || ' precomposed'),
        |  (3, 'A' || chr(778) || ' ring'),
        |  (4, chr(4352) || chr(4449) || chr(4520) || ' jamo'),
        |  (5, 'plain ascii'),
        |  (6, chr(8486) || ' ohm'),
        |  (7, 'e' || chr(803) || chr(769) || ' reorder'))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  nfc_normalize(txt) AS nfc,
        |  CAST(length(nfc_normalize(txt)) AS BIGINT) AS nfc_len
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_profile" ->
      """WITH p AS (
        |  SELECT 'doc_id' AS col_name, count(*) AS n_rows,
        |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS n_nulls,
        |    count(DISTINCT doc_id) AS n_distinct,
        |    CAST(min(doc_id) AS VARCHAR) AS min_val,
        |    CAST(max(doc_id) AS VARCHAR) AS max_val FROM documents
        |  UNION ALL SELECT 'text', count(*),
        |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT text), min(text), max(text) FROM documents
        |  UNION ALL SELECT 'lang', count(*),
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT lang), min(lang), max(lang) FROM documents
        |  UNION ALL SELECT 'source', count(*),
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT source), min(source), max(source) FROM documents
        |  UNION ALL SELECT 'n_chars', count(*),
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT n_chars),
        |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |  FROM documents)
        |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_nulls AS BIGINT) AS n_nulls,
        |  CAST(n_distinct AS BIGINT) AS n_distinct, min_val, max_val
        |FROM p ORDER BY col_name""".stripMargin,

    "q_phrase_search" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |st AS (SELECT doc_id, unnest(list_filter(
        |    range(1, greatest(len(w) - 1, 1)),
        |    p -> w[p] = 'slow' AND w[p+1] = 'hash' AND w[p+2] = 'batch'))
        |  AS p FROM toks)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(min(p) - 1 AS BIGINT) AS first_pos
        |FROM st GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_pivot" ->
      """WITH d AS (SELECT source, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT source,
        |  CAST(COALESCE(SUM(CASE WHEN lang = 'de' THEN n_tokens END), 0) AS BIGINT) AS de_tokens,
        |  CAST(COALESCE(SUM(CASE WHEN lang = 'en' THEN n_tokens END), 0) AS BIGINT) AS en_tokens,
        |  CAST(COALESCE(SUM(CASE WHEN lang = 'es' THEN n_tokens END), 0) AS BIGINT) AS es_tokens,
        |  CAST(COALESCE(SUM(CASE WHEN lang = 'fr' THEN n_tokens END), 0) AS BIGINT) AS fr_tokens,
        |  CAST(COALESCE(SUM(CASE WHEN lang = 'zh' THEN n_tokens END), 0) AS BIGINT) AS zh_tokens
        |FROM d GROUP BY source ORDER BY source""".stripMargin,

    // replace-count semantics make the single-pass automaton exactly
    // expressible: n_hits = (len - len(replace)) / len(pattern),
    // first_pos = instr — greedy non-overlapping on both engines
    "q_blocklist_hits" ->
      """WITH pats(pid, pattern) AS (VALUES
        |  (0, 'slow'), (1, 'hash join'), (2, 'join'),
        |  (3, 'value table'), (4, 'table'), (5, 'a a')),
        |h AS (SELECT d.doc_id, p.pid, p.pattern,
        |    instr(d.text, p.pattern) AS fp,
        |    (length(d.text) - length(replace(d.text, p.pattern, '')))
        |      // length(p.pattern) AS n_hits
        |  FROM documents d CROSS JOIN pats p)
        |SELECT doc_id, CAST(pid AS BIGINT) AS pid, pattern,
        |  CAST(fp AS BIGINT) AS first_pos, CAST(n_hits AS BIGINT) AS n_hits
        |FROM h WHERE n_hits > 0 ORDER BY doc_id, pid""".stripMargin,

    "q_blocklist_gate" ->
      """WITH pats(pid, pattern, w) AS (VALUES
        |  (0, 'slow', 1), (1, 'hash join', 5), (2, 'join', 1),
        |  (3, 'value table', 3), (4, 'table', 1), (5, 'a a', 2)),
        |h AS (SELECT d.doc_id, p.w,
        |    (length(d.text) - length(replace(d.text, p.pattern, '')))
        |      // length(p.pattern) AS n_hits
        |  FROM documents d CROSS JOIN pats p)
        |SELECT doc_id,
        |  CAST(count(*) FILTER (WHERE n_hits > 0) AS BIGINT) AS n_patterns_hit,
        |  CAST(sum(n_hits) AS BIGINT) AS n_hits_total,
        |  CAST(sum(n_hits * w) AS BIGINT) AS score,
        |  sum(n_hits * w) < 12 AS keep
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_oov_rate" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok FROM (
        |  SELECT tok, count(*) AS n FROM toks GROUP BY tok
        |  ORDER BY n DESC, tok LIMIT 25)),
        |agg AS (SELECT t.doc_id, count(*) AS n_tokens,
        |    count(*) FILTER (WHERE v.tok IS NULL) AS n_oov
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |  GROUP BY t.doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_oov AS BIGINT) AS n_oov,
        |  CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm
        |FROM agg ORDER BY doc_id""".stripMargin,

    // nested same-length replaces in declaration order — the exact
    // sequential semantics the engine's scrub chain applies
    "q_blocklist_scrub" ->
      """WITH pats(pid, pattern, w) AS (VALUES
        |  (0, 'slow', 1), (1, 'hash join', 5), (2, 'join', 1),
        |  (3, 'value table', 3), (4, 'table', 1), (5, 'a a', 2)),
        |h AS (SELECT d.doc_id, p.w,
        |    (length(d.text) - length(replace(d.text, p.pattern, '')))
        |      // length(p.pattern) AS n_hits
        |  FROM documents d CROSS JOIN pats p),
        |dropped AS (SELECT doc_id FROM h GROUP BY doc_id
        |  HAVING sum(n_hits * w) >= 12),
        |s AS (SELECT d.doc_id,
        |    replace(replace(replace(replace(replace(replace(d.text,
        |      'slow', '****'), 'hash join', '*********'),
        |      'join', '****'), 'value table', '***********'),
        |      'table', '*****'), 'a a', '***') AS scrubbed
        |  FROM documents d JOIN dropped USING (doc_id))
        |SELECT doc_id, scrubbed,
        |  CAST(length(scrubbed) AS BIGINT) AS n_chars,
        |  CAST(length(scrubbed) - length(replace(scrubbed, '*', ''))
        |    AS BIGINT) AS n_masked
        |FROM s ORDER BY doc_id""".stripMargin,

    // same padded-gram replace-count arithmetic as the engine's
    // automaton; the space padding enforces word boundaries
    "q_decontaminate_exact" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |ev AS (SELECT DISTINCT g FROM (
        |  SELECT unnest(list_transform(
        |      CASE WHEN len(w) >= 4 THEN range(1, len(w) - 2) ELSE [] END,
        |      i -> ' ' || w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
        |        || w[i+3] || ' ')) AS g
        |    FROM toks WHERE doc_id < 10)),
        |tr AS (SELECT doc_id, ' ' || text || ' ' AS padded
        |  FROM documents WHERE doc_id >= 10),
        |h AS (SELECT tr.doc_id, ev.g,
        |    (length(padded) - length(replace(padded, g, '')))
        |      // length(g) AS n_hits
        |  FROM tr CROSS JOIN ev)
        |SELECT doc_id AS corpus_id,
        |  CAST(count(*) FILTER (WHERE n_hits > 0) AS BIGINT) AS n_canaries,
        |  CAST(sum(n_hits) AS BIGINT) AS n_hits_total,
        |  sum(n_hits) >= 1 AS contaminated
        |FROM h GROUP BY doc_id ORDER BY corpus_id""".stripMargin
  )
}
