package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-fact regression gate: the structural facts of each audited
  * query's physical plan (exchanges, broadcast joins, window sorts,
  * file scans) must match the committed `PLANS_r09.txt` baseline — a
  * new shuffle or a lost broadcast in a PREVIOUSLY-AUDITED query fails
  * loud here instead of surfacing as a silent bench regression.
  *
  * Scope: a curated batch subset whose construction is lazy (no
  * fixture IO, no iterative localCheckpoint loops, no streaming
  * harness), so the spec costs plan compilation only. The baseline was
  * recorded by [[PlanAudit]] on the sf0.01 testdata with the same
  * session shape as [[TestSpark]] (local[4], 4 shuffle partitions,
  * 10 MB broadcast threshold) — regenerate it with
  * `runMain graft.PlanAudit` after an INTENTIONAL plan change and
  * commit the diff alongside the operator change that caused it.
  */
class PlanFactsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val SfDir = "/root/testdata/sf0.01"
  private val Baseline = "PLANS_r09.txt"

  /** Lazy-construction batch queries worth guarding: the core
    * join/agg/window surface, the text/similarity hot paths, and the
    * layout-sensitive scans.
    */
  private val Audited = Seq(
    "q_agg_q1", "q_join_agg", "q_entry_filter", "q_per_key_topk",
    "q_skew_join", "q_range_join", "q_asof_join", "q_lookup_join",
    "q_semi_join", "q_anti_join", "q_cube", "q_rollup",
    "q_window_frames", "q_running_count_partitioned", "q_cosine_topk",
    "q_bm25", "q_tfidf_keywords", "q_token_stats", "q_quality_deciles",
    "q_strat_sample", "q_ppjoin", "q_dedup_exact", "q_ngram_jaccard",
    "q_ewma", "q_rolling", "q_contrastive_pairs",
    "q_suffix_spans", "q_suffix_strip", "q_suffix_keepfirst",
    "q_suffix_incremental", "q_suffix_rewrite", "q_transitions",
    "q_grouping_sets", "q_gini", "q_trimmed_mean")

  private case class Facts(ex: Int, bhj: Int, win: Int, scans: Int)

  private lazy val baseline: Map[String, Facts] = {
    val f = new java.io.File(Baseline)
    assert(f.exists(), s"$Baseline missing — run `runMain graft.PlanAudit` " +
      "and commit its output")
    val Line =
      """PLAN (\S+) exchanges=(\d+) broadcastJoins=(\d+) windows=(\d+) fileScans=(\d+)""".r
    scala.io.Source.fromFile(f).getLines().collect {
      case Line(n, e, b, w, s) => n -> Facts(e.toInt, b.toInt, w.toInt, s.toInt)
    }.toMap
  }

  private def currentFacts(name: String): Facts = {
    val plan = SparkEntry.queries(name)(spark, SfDir)
      .queryExecution.executedPlan.toString
    Facts(
      "Exchange".r.findAllIn(plan).length,
      "BroadcastHashJoin".r.findAllIn(plan).length,
      "Window".r.findAllIn(plan).length,
      "FileScan".r.findAllIn(plan).length)
  }

  test("baseline covers every audited query") {
    val missing = Audited.filterNot(baseline.contains)
    assert(missing.isEmpty,
      s"queries missing from $Baseline (regenerate it): $missing")
  }

  for (name <- Audited)
    test(s"plan facts unchanged: $name") {
      val now = currentFacts(name)
      val base = baseline(name)
      assert(now == base,
        s"$name plan drifted: baseline $base, now $now — if intentional, " +
          s"regenerate $Baseline via `runMain graft.PlanAudit` and commit it")
    }
}
