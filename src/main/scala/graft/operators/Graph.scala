package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Graph-ranking operators for corpus curation: PageRank over a link
  * graph ranks domains/documents for crawl prioritization and quality
  * weighting (the classic signal behind "trusted seed" corpus mixes).
  *
  * Scale design (100 TB): the edge set — the big side — is materialized
  * ONCE and never reshuffled; each iteration moves only 16-byte
  * `(node, rank)` rows through two shuffles (one join with the standing
  * edge+degree table, one partial-aggregated contribution sum). Rank
  * state is eagerly localCheckpointed per iteration, truncating the
  * iterative lineage exactly like [[Dedup.connectedComponents]].
  *
  * All arithmetic is scaled-integer (`rank_pp` parts-per-`scale`) with
  * integral division only, so a relational oracle reproduces every rank
  * bit-for-bit — no float summation order to disagree on.
  */
object Graph {

  /** Fixed-iteration integer PageRank.
    *
    * Semantics per iteration (every quantity a non-negative BIGINT;
    * `div` is integral division, all sums exact):
    * {{{
    *   contrib(v) = Σ_{(u,v) ∈ E} rank(u) div outdeg(u)
    *   dangling   = Σ_{u: outdeg(u)=0} rank(u)
    *   rank'(v)   = ( (100-dampingPct) * (scale div n)
    *                + dampingPct * (contrib(v) + dangling div n) ) div 100
    * }}}
    * starting from `rank0 = scale div n`. Parallel edges collapse
    * (the edge set is `distinct`); self-loops count as ordinary edges.
    * Truncation loses a few units of mass per node per iteration — the
    * ranking signal is unaffected and the trade buys exact
    * reproducibility in any ANSI engine.
    *
    * @param scale       fixed-point denominator (default 10^12: ranks are
    *                    "pico-rank" units). Bounded so
    *                    `dampingPct * 2 * scale` cannot overflow a long.
    * @param dampingPct  damping factor in percent (85 = the classic 0.85).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8, scale: Long = 1000000000000L,
      dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1,100], got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    require(scale > 0 && scale <= 10000000000000000L, // 10^16
      s"scale must be in (0, 10^16], got $scale")
    // the standing state: distinct edges with the source's out-degree
    // attached — built once, reused by all iterations
    val e = edges
      .select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank: empty edge set")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src").localCheckpoint(true)
    // the SET of dangling nodes is static across iterations (only their
    // rank changes) — resolve the anti-join once, not once per iteration
    val dangNodes = nodes
      .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
      .localCheckpoint(true)
    val base = scale / n
    var ranks = nodes.select(col("node"), lit(base).as("r"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val contribs = ed
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("c"))
      // dangling mass redistributes uniformly. One-row aggregate,
      // broadcast into the rank update — no driver collect in the loop
      val dang = ranks
        .join(dangNodes, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      // lazy checkpoint: ranks feeds two consumers next iteration
      // (contributions and the dangling sum) — block-backed after first
      // materialization, and the whole iteration chain evaluates in ONE
      // action at the end instead of one scheduled job set per iteration
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          expr(s"(${100 - dampingPct}L * ${base}L + ${dampingPct}L * " +
            s"(coalesce(c, 0L) + (dang div ${n}L))) div 100L").as("r"))
        .localCheckpoint(false)
      i += 1
    }
    ranks.select(col("node"), col("r").as("rank_pp"))
  }
}
