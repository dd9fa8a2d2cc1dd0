package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.expressions.MultiPatternHits

/** Blocklist screening over a document corpus: which documents contain
  * which of a configured set of literal phrases, and which documents a
  * severity-weighted policy would drop — the "bad-word / boilerplate /
  * contamination-canary" gate every large-scale curation pipeline runs
  * before training (the C4 and Gopher cleanup stages are exactly this
  * shape: a fixed phrase list swept over every document).
  *
  * Both faces ride [[graft.expressions.MultiPatternHits]] — ONE
  * Aho–Corasick scan per document for the whole pattern set (O(len),
  * not O(patterns·len)) with replace-count semantics, so every output
  * is exactly reproducible in ANSI SQL (`instr` + `replace`-length
  * arithmetic) for the oracle. No shuffle happens until the caller's
  * aggregation: the scan is a pure projection, embarrassingly parallel
  * over whatever partitioning the 100 TB corpus already has.
  */
object Blocklist {

  private def hitsCol(textCol: String, patterns: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MultiPatternHits(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          col(textCol)), patterns))

  /** Per-(document, pattern) hit table: `(id, pid, pattern, first_pos,
    * n_hits)`, one row per pattern with ≥1 occurrence in the document.
    * `n_hits` counts greedy non-overlapping occurrences; `first_pos` is
    * the 1-based character position of the first occurrence.
    */
  def hits(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val names = array(patterns.map(lit): _*)
    docs
      .select(col(idCol), explode(hitsCol(textCol, patterns)).as("__h"))
      .select(col(idCol), col("__h.pid").as("pid"),
        element_at(names, (col("__h.pid") + 1).cast("int")).as("pattern"),
        col("__h.first_pos").as("first_pos"),
        col("__h.n_hits").as("n_hits"))
  }

  /** [[hits]] with the pattern set read from a TABLE — how a real
    * deployment ships its blocklist (a curated dimension, not code).
    * The pattern table is collected driver-side with a LOUD cap
    * (blocklists are dimension-sized by contract; a runaway join
    * result masquerading as a pattern table should fail, not compile
    * a 10M-state automaton), sorted for deterministic pid assignment,
    * then compiled once.
    */
  def hitsFromTable(docs: DataFrame, idCol: String, textCol: String,
      patterns: DataFrame, patternCol: String,
      maxPatterns: Int = 100000): DataFrame = {
    val pats = patterns.select(col(patternCol).cast("string"))
      .na.drop().distinct().orderBy(patternCol)
      .limit(maxPatterns + 1)
      .collect().map(_.getString(0)).toSeq
    require(pats.size <= maxPatterns,
      s"pattern table exceeds maxPatterns=$maxPatterns — not a blocklist")
    require(pats.nonEmpty, "pattern table is empty")
    hits(docs, idCol, textCol, pats)
  }

  /** Same-length masking scrub: every occurrence of every pattern is
    * overwritten with `maskChar`, patterns applied IN ORDER with
    * nested-replace semantics (each pattern sees the text as already
    * masked by its predecessors — the exact semantics of the SQL
    * `replace(replace(...))` chain, so the face is oracle-exact).
    *
    * This is deliberately NOT the single-pass automaton: a scrub must
    * materialize the rewritten text anyway (output-dominated), and
    * sequential nested-replace semantics cannot be reproduced in one
    * pass when an earlier pattern's mask destroys a later pattern's
    * match. [[hits]]/[[gate]] remain the O(len) detection path; scrub
    * is the O(patterns·len) rewrite path you run on the (gated,
    * far smaller) slice that actually needs masking.
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], maskChar: String = "*"): DataFrame = {
    require(patterns.nonEmpty, "blocklist must be non-empty")
    require(maskChar.length == 1, "maskChar must be a single character")
    val scrubbed = patterns.foldLeft(col(textCol)) { (c, p) =>
      call_function("replace", c, lit(p), lit(maskChar * p.length))
    }
    docs.select(col(idCol), col(textCol), scrubbed.as("scrubbed"))
  }

  /** Severity-weighted keep/drop gate: each document's score is
    * `Σ n_hits(p) · weight(p)` over the blocklist, and the document is
    * kept iff `score < threshold`. Emits EVERY document (hit or not) as
    * `(id, n_patterns_hit, n_hits_total, score, keep)` so the face
    * doubles as the audit report ("how close is the corpus to the
    * gate"), not just the filter.
    *
    * Weights ship with the patterns (mild boilerplate = 1, hard
    * blockers = large); a drop-on-any-hit policy is `weight = threshold`
    * on every pattern.
    */
  def gate(docs: DataFrame, idCol: String, textCol: String,
      weighted: Seq[(String, Long)], threshold: Long): DataFrame = {
    require(weighted.nonEmpty, "blocklist must be non-empty")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val weights = array(weighted.map { case (_, w) => lit(w) }: _*)
    docs
      .select(col(idCol),
        hitsCol(textCol, weighted.map(_._1)).as("__hs"))
      .select(col(idCol),
        // NULL text → NULL hits array; coalesce so the gate's 0-count
        // (and keep=true via score 0) semantics hold for any corpus
        coalesce(size(col("__hs")).cast(LongType), lit(0L))
          .as("n_patterns_hit"),
        coalesce(aggregate(col("__hs"), lit(0L),
          (acc, h) => acc + h.getField("n_hits")), lit(0L))
          .as("n_hits_total"),
        coalesce(aggregate(col("__hs"), lit(0L),
          (acc, h) => acc + h.getField("n_hits") *
            element_at(weights, (h.getField("pid") + 1).cast("int"))),
          lit(0L)).as("score"))
      .withColumn("keep", col("score") < lit(threshold))
  }
}
