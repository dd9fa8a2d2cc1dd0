package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skyline (Pareto-optimal) selection — multi-objective picking without
  * a scalarized score: keep every row no other row dominates
  * (better-or-equal on ALL objectives, strictly better on at least
  * one). The curation shape: "docs on the quality/length frontier",
  * "cheapest-and-freshest source per domain" — scalar weights force a
  * tradeoff choice; the skyline defers it.
  *
  * Distributed the classic way — the skyline operator is distributive:
  * `skyline(S) = skyline(∪ᵢ skyline(partitionᵢ))`. Phase 1 prunes each
  * partition to its local skyline in one `mapPartitions` pass (the
  * genuine per-partition imperative case: an in-memory candidate list,
  * O(n·s) with s = local skyline size, no shuffle). Phase 2 resolves
  * the global skyline over the tiny candidate union with a dominance
  * anti-join (s² pairs, s ≪ n). A full-table dominance anti-join would
  * be O(n²) — the local prune is what makes 100 TB feasible.
  *
  * Ties on every objective survive together (neither strictly
  * dominates); output is a deterministic SET. Nulls in objective
  * columns are rejected up front (a null would silently escape
  * dominance).
  */
object Skyline {

  /** @param minCols objectives to minimize; @param maxCols to maximize.
    * Returns `(idCol, minCols..., maxCols...)` rows of the skyline,
    * objectives cast to double.
    */
  def skyline(df: DataFrame, idCol: String, minCols: Seq[String],
      maxCols: Seq[String]): DataFrame = {
    require(minCols.nonEmpty || maxCols.nonEmpty, "skyline: no objectives")
    val dims = minCols ++ maxCols
    val nMin = minCols.size
    val proj = df.select(col(idCol).cast(LongType).as(idCol) +:
      dims.map(c => col(c).cast(DoubleType).as(c)): _*)
      .filter(dims.map(col(_).isNotNull).reduce(_ && _))
    val schema = proj.schema
    // oriented values: negate max-objectives so dominance is uniformly
    // "<= everywhere, < somewhere"
    def key(r: Row): Array[Double] =
      Array.tabulate(dims.size) { i =>
        val v = r.getDouble(i + 1)
        if (i < nMin) v else -v
      }
    def dominates(a: Array[Double], b: Array[Double]): Boolean = {
      var i = 0; var strict = false
      while (i < a.length) {
        if (a(i) > b(i)) return false
        if (a(i) < b(i)) strict = true
        i += 1
      }
      strict
    }
    val local = proj.mapPartitions { it =>
      val cand = scala.collection.mutable.ArrayBuffer.empty[(Row, Array[Double])]
      it.foreach { r =>
        val k = key(r)
        if (!cand.exists { case (_, c) => dominates(c, k) }) {
          val kept = cand.filterNot { case (_, c) => dominates(k, c) }
          cand.clear(); cand ++= kept; cand += ((r, k))
        }
      }
      cand.iterator.map(_._1)
    }(Encoders.row(schema))
    // global resolution over the pruned candidates: drop every candidate
    // some other candidate strictly dominates
    val a = local.alias("a")
    val b = local.alias("b")
    val allLeq = dims.zipWithIndex.map { case (c, i) =>
      if (i < nMin) col(s"b.$c") <= col(s"a.$c")
      else col(s"b.$c") >= col(s"a.$c")
    }.reduce(_ && _)
    val anyStrict = dims.zipWithIndex.map { case (c, i) =>
      if (i < nMin) col(s"b.$c") < col(s"a.$c")
      else col(s"b.$c") > col(s"a.$c")
    }.reduce(_ || _)
    a.join(b, allLeq && anyStrict, "left_anti")
  }
}
