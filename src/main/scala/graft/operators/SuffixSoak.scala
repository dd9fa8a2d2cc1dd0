package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the exact-substring dedup chain (r11 verdict #6 /
  * r12 verdict #2): run [[SuffixDedup.spanPairs]] + connected
  * components against a given tier with a cap LOW enough that the
  * replica corpus's shared grams actually exceed it, and report —
  * from a census pass using the SAME [[graft.expressions.GramHashes]]
  * kernel as the mandatory pre-cap — how many hash buckets fell in
  * each band: singleton (dropped), [2, cap] (kept), (cap, 2×cap] and
  * > 2×cap (both dropped BEFORE the `collect_set` since the r13 exact
  * pre-cap closed the executor-OOM path without the r12 headroom; the
  * band split stays so the headroom volume remains visible).
  *
  * Usage: `runMain graft.operators.SuffixSoak <sfDir> [cap] [minLen]`
  * Prints one JSON line:
  * `{"dir":…,"cap":…,"buckets":…,"singleton":…,"kept_2_to_cap":…,
  *   "dropped_cap_to_2cap":…,"dropped_over_2cap":…,"over_cap":…,
  *   "max_docs_per_gram":…,"dropped_collision":…,"pairs":N,
  *   "pairs_sec":…,"components":N,"chain_sec":…}`
  * (`dropped_collision` = over-cap buckets holding ≥ 2 distinct grams
  * — the r14 shrapnel class, expected 0 outside a ~2⁻⁶⁴ event)
  * so the soak table is generated from artifacts, never hand-counted.
  * `pairs_sec` covers spanPairs build + materialization (one
  * localCheckpoint); `chain_sec` covers connected components over the
  * MATERIALIZED pairs only (r13 double-executed the pairs DAG inside
  * the components timing, overstating it).
  */
object SuffixSoak {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = if (args.length > 1) args(1).toInt else 5
    val minLen = if (args.length > 2) args(2).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // census: per-hash distinct-doc counts, banded at the cap — the
    // exact quantity the pre-cap pass filters on
    // sums coalesced to 0: an EMPTY tier (no doc reaches minLen) yields
    // NULL sums, and getLong on a null cell NPEs instead of reporting
    // the honest all-zero census row. The census rides the SAME
    // gramBucketStats pass as the production pre-cap, so it also
    // carries the r14 drop-class split (__ng >= 2 = collision
    // shrapnel) at census grain.
    val census = SuffixDedup.gramBucketStats(docs, "doc_id", "text", minLen)
      .withColumnRenamed("__nd", "nd").withColumnRenamed("__ng", "ng")
      .agg(
        count(lit(1)).as("buckets"),
        coalesce(sum(when(col("nd") === 1, 1L).otherwise(0L)), lit(0L))
          .as("singleton"),
        coalesce(sum(when(col("nd").between(2, cap), 1L).otherwise(0L)),
          lit(0L)).as("kept_2_to_cap"),
        coalesce(sum(when(col("nd") > cap && col("nd") <= 2L * cap, 1L)
          .otherwise(0L)), lit(0L)).as("dropped_cap_to_2cap"),
        coalesce(sum(when(col("nd") > 2L * cap, 1L).otherwise(0L)),
          lit(0L)).as("dropped_over_2cap"),
        coalesce(sum(when(col("nd") > cap, 1L).otherwise(0L)), lit(0L))
          .as("over_cap"),
        coalesce(max(col("nd")), lit(0L)).as("max_docs_per_gram"),
        coalesce(sum(when(col("nd") > cap && col("ng") >= 2, 1L)
          .otherwise(0L)), lit(0L)).as("dropped_collision"))
      .collect()(0)

    // pairs materialized ONCE (localCheckpoint) and reused: the old
    // shape re-executed the whole spanPairs DAG inside the components
    // timing, so chain_sec double-counted pair generation
    val t0 = System.nanoTime()
    val pairs = SuffixDedup.spanPairs(docs, "doc_id", "text",
      minLen = minLen, maxDocsPerGram = cap)
      .localCheckpoint(true)
    val nPairs = pairs.count()
    val pairsSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val comps = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")))
    val nComps = comps.select(col("label")).distinct().count()
    val chainSec = (System.nanoTime() - t1) / 1e9

    println(s"""{"dir":"$dir","cap":$cap,"min_len":$minLen,""" +
      s""""buckets":${census.getLong(0)},""" +
      s""""singleton":${census.getLong(1)},""" +
      s""""kept_2_to_cap":${census.getLong(2)},""" +
      s""""dropped_cap_to_2cap":${census.getLong(3)},""" +
      s""""dropped_over_2cap":${census.getLong(4)},""" +
      s""""over_cap":${census.getLong(5)},""" +
      s""""max_docs_per_gram":${census.getLong(6)},""" +
      s""""dropped_collision":${census.getLong(7)},""" +
      s""""pairs":$nPairs,"pairs_sec":$pairsSec,""" +
      s""""components":$nComps,"chain_sec":$chainSec}""")
    spark.stop()
  }
}
