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

  /** The composed pipeline over an entity frame carrying all three
    * modalities: `(id, text, hex, score)` where `hex` is the
    * hex-encoded media payload both perceptual channels decode
    * ([[Multimodal.fingerprintImageHex]] pixels for the image channel,
    * [[Multimodal.fingerprintWavHex]] samples for the audio channel).
    * Returns the attrition ledger over stages
    * `text_exact → audio_near_dup → image_near_dup →
    * cross_modal_merge`.
    */
  def prepAttrition(ents: DataFrame, hammingImg: Int = 3,
      hammingWav: Int = 1, maxBucketSize: Int = 1000): DataFrame = {
    val scored = ents.select(col("id"), col("score"))
    val txtPairs = ents.groupBy(col("text"))
      .agg(collect_set(col("id")).as("__ids"))
      .filter(size(col("__ids")) >= 2)
      .select(array_min(col("__ids")).as("id_a"),
        explode(col("__ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
    val imgPairs = ImageDedup.nearDupPairs(
      Multimodal.fingerprintImageHex(ents, "id", "hex"),
      hammingMax = hammingImg, maxBucketSize = maxBucketSize)
      .select(col("id_a"), col("id_b"))
    val avPairs = ImageDedup.nearDupPairs(
      Multimodal.fingerprintWavHex(ents, "id", "hex"),
      hammingMax = hammingWav, maxBucketSize = maxBucketSize,
      sketcher = ImageDedup.wavDeltaSketches)
      .select(col("id_a"), col("id_b"))
    // per-channel arbitration losers: CC over the channel's pairs,
    // keeper = max(score), min(id) on ties — keepBest's rule at member
    // grain
    def losers(pairs: DataFrame): DataFrame = {
      val labeled = Dedup.connectedComponents(pairs)
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
