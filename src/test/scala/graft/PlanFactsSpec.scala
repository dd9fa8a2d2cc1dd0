package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-fact regression gate: the structural facts of each audited
  * query's physical plan (exchanges, broadcast joins, window sorts,
  * file scans) must match the committed `PLANS_r10.txt` baseline — a
  * new shuffle or a lost broadcast in a PREVIOUSLY-AUDITED query fails
  * loud here instead of surfacing as a silent bench regression.
  *
  * Scope is DERIVED from the baseline itself (round-9 verdict #6): every
  * query whose recorded `buildMs` is under [[LazyBuildMs]] constructs
  * lazily (plan compilation only — no fixture IO, no eager
  * localCheckpoint, no streaming harness), so guarding it costs
  * milliseconds; eager queries stay out automatically. The baseline was
  * recorded by [[PlanAudit]] on the sf0.01 testdata with the same
  * session shape as [[TestSpark]] (local[4], 4 shuffle partitions,
  * 10 MB broadcast threshold) — regenerate it with
  * `runMain graft.PlanAudit` after an INTENTIONAL plan change and
  * commit the diff alongside the operator change that caused it.
  */
class PlanFactsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val SfDir = "/root/testdata/sf0.01"
  private val Baseline = "PLANS_r10.txt"
  private val LazyBuildMs = 300

  /** Queries excluded even when construction is fast: their plan facts
    * are nondeterministic across sessions (sample-derived literals) or
    * their build depends on JVM-temp fixture paths.
    */
  private val Excluded = Set.empty[String]

  private case class Facts(ex: Int, bhj: Int, win: Int, scans: Int)

  private lazy val baseline: Map[String, (Facts, Int)] = {
    val f = new java.io.File(Baseline)
    assert(f.exists(), s"$Baseline missing — run `runMain graft.PlanAudit` " +
      "and commit its output")
    val Line =
      ("""PLAN (\S+) exchanges=(\d+) broadcastJoins=(\d+) windows=(\d+) """ +
        """fileScans=(\d+) buildMs=(\d+)""").r
    scala.io.Source.fromFile(f).getLines().collect {
      case Line(n, e, b, w, s, ms) =>
        n -> (Facts(e.toInt, b.toInt, w.toInt, s.toInt), ms.toInt)
    }.toMap
  }

  private lazy val audited: Seq[String] = baseline.collect {
    case (n, (_, ms)) if ms < LazyBuildMs && !Excluded(n) => n
  }.toSeq.sorted

  private def currentFacts(name: String): Facts = {
    val plan = SparkEntry.queries(name)(spark, SfDir)
      .queryExecution.executedPlan.toString
    Facts(
      "Exchange".r.findAllIn(plan).length,
      "BroadcastHashJoin".r.findAllIn(plan).length,
      "Window".r.findAllIn(plan).length,
      "FileScan".r.findAllIn(plan).length)
  }

  test("the lazy-build majority of the registry is plan-guarded") {
    assert(audited.size >= 100,
      s"only ${audited.size} queries under ${LazyBuildMs}ms in $Baseline — " +
        "regenerate the baseline (did PlanAudit stop emitting buildMs?)")
  }

  test("plan facts unchanged across the audited registry") {
    val drifted = audited.flatMap { name =>
      val now = currentFacts(name)
      val base = baseline(name)._1
      if (now == base) None else Some(s"$name: baseline $base, now $now")
    }
    assert(drifted.isEmpty,
      s"${drifted.size} plan(s) drifted — if intentional, regenerate " +
        s"$Baseline via `runMain graft.PlanAudit` and commit it:\n" +
        drifted.mkString("\n"))
  }
}
