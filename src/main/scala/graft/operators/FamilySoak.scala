package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the incremental template-family index (r13 verdict
  * #1): measures what [[SuffixDedup.familyIndex]] +
  * [[SuffixDedup.incrementalFamilies]] buy over re-running
  * [[SuffixDedup.spanPairs]] + connected components corpus-wide per
  * batch, and whether the PROBE cost is decoupled from corpus size
  * (the 100 TB claim: a daily batch must not pay the corpus price).
  *
  * Tiers: `full` = every non-batch doc, `half` = every other one.
  * The batch (every 10th doc) is IDENTICAL in both tiers, so
  * `probe_full_sec` vs `probe_half_sec` isolates the corpus-size
  * dependence of one probe against a standing (pre-materialized)
  * index, while `rerun_full_sec` is the today's-cost baseline the
  * index replaces.
  *
  * Usage: `runMain graft.operators.FamilySoak <sfDir> [cap] [minLen]`
  * Prints one JSON line:
  * `{"dir":…,"cap":…,"min_len":…,"corpus_full":N,"corpus_half":N,
  *   "batch":N,"index_full_sec":…,"index_half_sec":…,
  *   "probe_full_sec":…,"probe_half_sec":…,"rerun_full_sec":…,
  *   "families_probe":N,"families_rerun":N,"batch_rows_equal":bool}`
  * — `batch_rows_equal` re-asserts the oracle equality (probe ≡ rerun
  * restricted to batch docs) at this tier's scale, so the soak is also
  * a correctness run, not only a stopwatch.
  */
object FamilySoak {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = if (args.length > 1) args(1).toInt else 1000
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
      .select(col("doc_id"), col("text"))

    val batch = docs.filter(col("doc_id") % 10 === 0).localCheckpoint(true)
    val corpusFull = docs.filter(col("doc_id") % 10 =!= 0)
      .localCheckpoint(true)
    val corpusHalf = corpusFull.filter(col("doc_id") % 2 === 1)
      .localCheckpoint(true)
    val nBatch = batch.count()
    val nFull = corpusFull.count()
    val nHalf = corpusHalf.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // standing state per tier: materialized index + labels (the
    // build-once cost a production pipeline amortizes across batches);
    // labels derive FROM the index (familyLabels) so the build is one
    // corpus gram pass — the production path q_family_incremental runs
    def build(corpus: org.apache.spark.sql.DataFrame) = timed {
      val idx = SuffixDedup.familyIndex(corpus, "doc_id", "text",
        minLen, cap).localCheckpoint(true)
      val labels = SuffixDedup.familyLabels(idx, cap)
        .localCheckpoint(true)
      (idx, labels)
    }
    val ((idxFull, lblFull), indexFullSec) = build(corpusFull)
    val ((idxHalf, lblHalf), indexHalfSec) = build(corpusHalf)

    def probe(idx: org.apache.spark.sql.DataFrame,
        lbl: org.apache.spark.sql.DataFrame) = timed {
      SuffixDedup.incrementalFamilies(batch, "doc_id", "text", idx, lbl,
        minLen, cap).localCheckpoint(true)
    }
    val (famFull, probeFullSec) = probe(idxFull, lblFull)
    val (_, probeHalfSec) = probe(idxHalf, lblHalf)

    // today's cost: whole-corpus rerun over corpus+batch, restricted
    // to batch docs — also the ground truth for the equality assert
    val (rerunBatch, rerunFullSec) = timed {
      val all = corpusFull.unionByName(batch)
      val fams = Dedup.connectedComponents(
        SuffixDedup.spanPairs(all, "doc_id", "text", minLen, cap)
          .select(col("id_a"), col("id_b")))
        .withColumnRenamed("id", "doc_id")
      batch.select(col("doc_id")).join(fams, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("family"))
        .localCheckpoint(true)
    }
    val famProbe = famFull.select(countDistinct(col("family"))).head.getLong(0)
    val famRerun = rerunBatch.select(countDistinct(col("family"))).head.getLong(0)
    val equal = famFull.exceptAll(rerunBatch).isEmpty &&
      rerunBatch.exceptAll(famFull).isEmpty

    println(s"""{"dir":"$dir","cap":$cap,"min_len":$minLen,""" +
      s""""corpus_full":$nFull,"corpus_half":$nHalf,"batch":$nBatch,""" +
      s""""index_full_sec":$indexFullSec,"index_half_sec":$indexHalfSec,""" +
      s""""probe_full_sec":$probeFullSec,"probe_half_sec":$probeHalfSec,""" +
      s""""rerun_full_sec":$rerunFullSec,"families_probe":$famProbe,""" +
      s""""families_rerun":$famRerun,"batch_rows_equal":$equal}""")
    spark.stop()
  }
}
