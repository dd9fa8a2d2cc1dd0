package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

object FrequentItems {

  /** Exact heavy hitters: tokens whose corpus count is at least
    * `minFrac` of all token occurrences. Two-level hash aggregation with
    * map-side partials (token counts, then the scalar total broadcast
    * back) — the oracle-checkable formulation, viable as long as the
    * distinct-token keyspace shuffles; [[approxHeavyHitters]] is the
    * bounded-memory path past that.
    */
  def heavyHitters(df: DataFrame, textCol: String,
      minFrac: Double): DataFrame = {
    val counts = df.select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast(LongType).as("cnt"))
    val total = counts.agg(sum("cnt").as("n_total"))
    counts.crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") >= col("n_total") * minFrac)
      .select(col("tok"), col("cnt"), col("n_total").cast(LongType)
        .as("n_total"))
  }

  /** Misra-Gries approximate heavy hitters: one O(m)-state summary per
    * task, merged treewise — shuffle volume O(partitions × m), no
    * token-keyed exchange at all. Returns (tok, min_count, err_bound)
    * where `min_count <= true count <= min_count + err_bound` and every
    * token with true count > err_bound (= n/m) is guaranteed present.
    */
  def approxHeavyHitters(df: DataFrame, textCol: String, m: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(split(col(textCol), " ")).as("tok"))
      .as[String]
    toks.select(new MisraGriesAggregator(m).toColumn)
      .toDF("hh", "n_total")
      .select(explode(col("hh")).as("e"), col("n_total"))
      .select(col("e._1").as("tok"), col("e._2").as("min_count"),
        expr(s"n_total DIV ${m}L").as("err_bound"))
  }
}

/** Misra-Gries frequent-items summary (Misra & Gries 1982; the mergeable
  * form from Agarwal et al., "Mergeable Summaries", PODS 2012) — the
  * bounded-memory scale path for heavy-hitter token/n-gram mining where
  * the exact two-level aggregation's keyspace (all distinct n-grams of a
  * 100 TB corpus) no longer fits a shuffle.
  *
  * Guarantees, for capacity m over n total occurrences:
  *   - every item with true count > n/m is present in the summary;
  *   - each reported count underestimates the true count by at most n/m
  *     (the summary also carries that bound so callers can surface it).
  *
  * Same engine shape as [[TopKAggregator]]: an object-hash aggregation
  * whose map-side partials keep O(m) state per task and ship O(m) rows,
  * independent of corpus size. The merge is the counter-wise sum followed
  * by a decrement of the (m+1)-th largest count — the PODS'12 proof that
  * Misra-Gries summaries compose without losing the error bound.
  *
  * The REPORTED counts depend on decrement order and are therefore
  * partitioning-dependent within the error bound; the exact formulation
  * stays the oracle (see q_heavy_hitters), and this aggregator is
  * spec-gated on its guarantees, mirroring how the HLL and
  * approx_percentile scale paths are gated (CardinalitySpec,
  * QuantileSpec).
  */
class MisraGriesAggregator(m: Int) extends Aggregator[String,
    (Map[String, Long], Long), (Seq[(String, Long)], Long)] {
  require(m >= 1, "capacity must be >= 1")

  /** Buffer = (counters, exact total weight seen) — the total rides along
    * so the n/m error bound comes out of the same single pass.
    */
  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  /** Classic MG step: count if tracked or free slot, else decrement.
    * Decrement-all is implemented lazily at compaction: evict the lowest
    * counters past capacity and subtract the (m+1)-th largest.
    */
  override def reduce(b: (Map[String, Long], Long),
      tok: String): (Map[String, Long], Long) = {
    val nb = b._1.updatedWith(tok) { c => Some(c.getOrElse(0L) + 1L) }
    (if (nb.size <= 2 * m) nb else compact(nb), b._2 + 1L)
  }

  override def merge(a: (Map[String, Long], Long),
      b: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val summed = b._1.foldLeft(a._1) { case (acc, (t, c)) =>
      acc.updatedWith(t)(x => Some(x.getOrElse(0L) + c))
    }
    (compact(summed), a._2 + b._2)
  }

  /** Keep the m largest counters, subtracting the (m+1)-th largest from
    * the survivors (ties broken by token for determinism of the SET —
    * counts remain order-dependent, as documented).
    */
  private def compact(b: Map[String, Long]): Map[String, Long] = {
    if (b.size <= m) b
    else {
      val sorted = b.toSeq.sortBy { case (t, c) => (-c, t) }
      val cut = sorted(m)._2
      sorted.take(m).map { case (t, c) => t -> (c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  override def finish(b: (Map[String, Long], Long)): (Seq[(String, Long)], Long) =
    (b._1.toSeq.sortBy { case (t, c) => (-c, t) }, b._2)

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Map[String, Long], Long)]()

  override def outputEncoder: Encoder[(Seq[(String, Long)], Long)] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Seq[(String, Long)], Long)]()
}
