package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-modality curation composition (r14 verdict #7, promoted to a
  * first-class operator in r16 so the oracle gate
  * (`q_corpus_prep_multimodal`) and the dense-tier soak
  * ([[CrossModalSoak]]) run ONE implementation): the three modality
  * sketch families feed ONE curation pipeline instead of coexisting —
  * text exact dedup, audio delta-hash near-dup, image aHash near-dup,
  * then the fourth CROSS-MODAL stage: the union of all three channels'
  * pairs resolves into merged families, where an entity can WIN every
  * single-channel arbitration yet lose the merged one when channels
  * bridge its cluster. Arbitration per cluster is keepBest's rule —
  * score desc, id asc — at member grain; the output is the
  * [[CorpusOps.attritionReport]] ledger (first-failing-stage
  * semantics).
  *
  * Scale shape: each channel is its own bucketed/banded sketch join
  * (exact-hash groupBy for text; Hamming-banded, bucket-capped
  * perceptual joins for image/audio — [[ImageDedup.nearDupPairs]]'s
  * plumbing with its loud `observeCaps`), so nothing here is all-pairs;
  * the merged stage runs [[Dedup.connectedComponents]] over the UNION
  * of channel pair lists — pair-scale, not corpus-scale, and O(log n)
  * rounds.
  */
object CrossModal {

  /** The four-class planted entity frame over a `(doc_id, text)` corpus
    * — the `q_corpus_prep_multimodal` fixture, parameterized so the
    * oracle gate (docs < 200) and [[CrossModalSoak]] (tier scale) build
    * the SAME construction. Entities `2i`/`2i+1` per doc `i`, each
    * class exercising its own stage:
    *   - `i%4=0` — text twins (same text, unrelated media) → stage 0;
    *   - `i%4=1` — media twins with distinct text and hex position 17
    *     rewritten: the audio anchors around that position flip 0-3
    *     delta bits, so the class SPLITS between the audio stage
    *     (hamming ≤ 1) and the image stage (≤ 3) — both exercised;
    *   - `i%4=2` — entity `2i` is the BRIDGE TARGET: it takes class-3
    *     neighbor doc `i+1`'s B-text (so its id is the smallest in the
    *     bridged cluster), `2i+1` inert;
    *   - `i%4=3` — the cross-modal construct: A=`2i` media-pairs
    *     B=`2i+1` (hex position 0 rewritten), B text-pairs C=`2(i-1)`;
    *     equal lengths → min-id arbitration: A wins its media cluster
    *     ({A,B} → A), B loses at text ({B,C} → C), and the merged
    *     {A,B,C} crowns C — A falls ONLY at the cross-modal stage.
    */
  def plantedEntities(docs: DataFrame): DataFrame = {
    val nxt = docs.select((col("doc_id") - 1).as("doc_id"),
      col("text").as("__ntext"))
    val d = docs.join(nxt, Seq("doc_id"), "left")
      .withColumn("__h", md5(to_binary(col("text"), lit("utf-8"))))
    val cls = col("doc_id") % 4
    def h(c: Column) = md5(to_binary(c, lit("utf-8")))
    val e0 = d.select((col("doc_id") * 2).as("id"),
      when(cls === 2 && col("__ntext").isNotNull,
        concat(lit("Q"), expr("substring(__ntext, 2)")))
        .otherwise(col("text")).as("text"))
      .withColumn("hex", h(col("text")))
    val e1 = d.select((col("doc_id") * 2 + 1).as("id"),
      when(cls === 1, concat(lit("X"), expr("substring(text, 2)")))
        .when(cls === 3, concat(lit("Q"), expr("substring(text, 2)")))
        .otherwise(col("text")).as("text"),
      when(cls === 0, h(concat(col("text"), lit("alt"))))
        .when(cls === 2, h(concat(col("text"), lit("zzz"))))
        .when(cls === 1, concat(expr("substring(__h, 1, 16)"), lit("0"),
          expr("substring(__h, 18)")))
        .otherwise(concat(lit("0"), expr("substring(__h, 2)")))
        .as("hex"))
    e0.unionByName(e1)
      .withColumn("score", length(col("text")).cast("long"))
  }

  /** The composed pipeline over an entity frame carrying all three
    * modalities: `(id, text, hex, score)` where `hex` is the
    * hex-encoded media payload both perceptual channels decode
    * ([[Multimodal.fingerprintImageHex]] pixels for the image channel,
    * [[Multimodal.fingerprintWavHex]] samples for the audio channel).
    * Returns the attrition ledger over stages
    * `text_exact → audio_near_dup → image_near_dup →
    * cross_modal_merge`.
    */
  def prepAttrition(ents0: DataFrame, hammingImg: Int = 3,
      hammingWav: Int = 1, maxBucketSize: Int = 1000): DataFrame = {
    // materialize the entity frame and each channel's pair list ONCE
    // (r17, guide §1.2.1): the four arbitrations below each collect
    // their pair graph, and the merged stage unions all three channels
    // — unpinned, every channel's sketch pipeline (including BOTH
    // perceptual hex DECODES) ran twice and the entity construction
    // once per plan branch. At 100 TB the decode-once property is the
    // point; at gate scale it halves the stage count. The entity frame
    // is CORPUS-scale (media payloads inline), so it materializes
    // through the size-tiered helper (r18: local tier at gate scale,
    // reliable disk-backed checkpoint above the threshold — an
    // executor loss must not kill the lineage of the one frame every
    // channel reads, guide §5); the pair lists are pair-scale but get
    // the same treatment for free.
    val ents = Materialize.eager(ents0)
    val scored = ents.select(col("id"), col("score"))
    val txtPairs = Materialize.eager(ents.groupBy(col("text"))
      .agg(collect_set(col("id")).as("__ids"))
      .filter(size(col("__ids")) >= 2)
      .select(array_min(col("__ids")).as("id_a"),
        explode(col("__ids")).as("id_b"))
      .filter(col("id_a") < col("id_b")))
    val imgPairs = Materialize.eager(ImageDedup.nearDupPairs(
      Multimodal.fingerprintImageHex(ents, "id", "hex"),
      hammingMax = hammingImg, maxBucketSize = maxBucketSize)
      .select(col("id_a"), col("id_b")))
    val avPairs = Materialize.eager(ImageDedup.nearDupPairs(
      Multimodal.fingerprintWavHex(ents, "id", "hex"),
      hammingMax = hammingWav, maxBucketSize = maxBucketSize,
      sketcher = ImageDedup.wavDeltaSketches)
      .select(col("id_a"), col("id_b")))
    // per-channel arbitration losers: CC over the channel's pairs
    // (pair-scale, never corpus-scale — the bounded path's guarded
    // driver union-find with distributed fallback), keeper =
    // max(score), min(id) on ties — keepBest's rule at member grain
    def losers(pairs: DataFrame): DataFrame = {
      val labeled = Dedup.connectedComponentsBounded(pairs,
          tag = "CrossModal.losers")
        .join(scored, Seq("id"))
      val keepers = labeled.groupBy(col("label"))
        .agg(max(struct(col("score"), (-col("id")).as("negid"))).as("b"))
        .select(col("label"), (-col("b.negid")).as("keeper_id"))
      labeled.join(keepers, Seq("label"))
        .filter(col("id") =!= col("keeper_id"))
        .select(col("id"), lit(true).as("__lose"))
    }
    def pass(c: Column): Column = !coalesce(c, lit(false))
    val flagged = scored
      .join(losers(txtPairs).withColumnRenamed("__lose", "__lt"),
        Seq("id"), "left")
      .join(losers(avPairs).withColumnRenamed("__lose", "__la"),
        Seq("id"), "left")
      .join(losers(imgPairs).withColumnRenamed("__lose", "__li"),
        Seq("id"), "left")
      .join(losers(txtPairs.unionByName(imgPairs).unionByName(avPairs))
        .withColumnRenamed("__lose", "__lc"), Seq("id"), "left")
    CorpusOps.attritionReport(flagged, Seq(
      ("text_exact", pass(col("__lt"))),
      ("audio_near_dup", pass(col("__la"))),
      ("image_near_dup", pass(col("__li"))),
      ("cross_modal_merge", pass(col("__lc")))))
  }
}
