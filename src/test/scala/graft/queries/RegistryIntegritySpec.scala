package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Registry wiring invariants. `SparkEntry.queries` is a `++` of eight
  * per-module maps — a duplicate name across modules would silently
  * SHADOW the earlier entry (last map wins) and the driver would gate
  * the wrong implementation under the old name. Same for `oracleSql`.
  */
class RegistryIntegritySpec extends AnyFunSuite {

  private val queryParts = Seq(
    "CoreQueries" -> CoreQueries.queries.keySet,
    "TextQueries" -> TextQueries.queries.keySet,
    "SimilarityQueries" -> SimilarityQueries.queries.keySet,
    "ParseQueries" -> ParseQueries.queries.keySet,
    "LmQueries" -> LmQueries.queries.keySet,
    "SketchQueries" -> SketchQueries.queries.keySet,
    "CurationQueries" -> CurationQueries.queries.keySet,
    "SelectionQueries" -> SelectionQueries.queries.keySet)

  test("no query name collides across modules") {
    val all = queryParts.flatMap { case (m, ks) => ks.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"shadowed registry names: " +
      dups.map { case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }
        .mkString(", "))
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle points at a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("no_oracle set is the documented hash-pinned fourteen") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // every no_oracle face must be one of the known hash-pinned
    // families (each has an oracle-green portable/evidence sibling) —
    // a NEW query accidentally shipped without an oracle fails here
    // instead of surfacing as a weaker rows-only check at the driver
    val allowed = Set(
      "q_ann_ivf", "q_ann_ivfpq", "q_ann_lsh", "q_ann_opq", "q_ann_pq",
      "q_bpe_tokens", "q_compress_ratio", "q_dedup_minhash",
      "q_dsir_select", "q_dsir_weights", "q_quality_logistic",
      "q_semantic_dedup", "q_simhash_sketch", "q_unigram_tokens")
    assert(noOracle == allowed,
      s"unexpected no_oracle queries: ${noOracle -- allowed}; " +
        s"missing: ${allowed -- noOracle}")
  }
}
