package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Lexical

/** Streaming corpus-card store — the per-source "datasheet" (docs,
  * exact-dup ppm, token/vocab totals, TTR, word-distribution entropy)
  * kept current over an unbounded document stream with BOUNDED work per
  * batch: each micro-batch appends only its OWN (group, word) counts
  * and (group, content-md5) dup ledger, and the report folds the merged
  * standing tables.
  *
  * Both state tables are ADDITIVE (the table of a concatenated corpus
  * is the per-key sum of the parts' tables), so the incremental card
  * equals the batch-mode [[Lexical.corpusCard]] of everything ingested
  * BIT-FOR-BIT — including the entropy double, because the fold runs
  * over the merged exact counts in the same word order, not over
  * per-batch partial entropies (entropy itself is NOT additive).
  * Proven in StreamingLexicalSpec.
  *
  * EXACTLY-ONCE: the sibling stores' recipe — state rows are
  * partitioned by `ingest_batch` under dynamic partition overwrite, so
  * a foreachBatch replay overwrites its own partition, and the merge
  * partition-prunes the current batch id out of the standing read.
  * Store growth per batch is the batch's OWN vocab/distinct-text size;
  * [[compact]] folds history back to the bootstrap partition — by
  * additivity, compaction cannot move any card value.
  */
object StreamingLexical {

  private def write(df: DataFrame, table: String, batchId: Long,
      path: String, init: Boolean): Unit = {
    val w = df.withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
    (if (init) w else w.option("partitionOverwriteMode", "dynamic"))
      .partitionBy("ingest_batch").parquet(s"$path/$table")
  }

  private def standing(spark: SparkSession, path: String, table: String,
      excludeBatch: Long): DataFrame =
    spark.read.parquet(s"$path/$table")
      .filter(col("ingest_batch") =!= excludeBatch)
      .drop("ingest_batch")

  /** One-time bootstrap: card + growth tables of the standing corpus
    * (`ingest_batch = -1`). `idCol` feeds the first-occurrence table
    * behind [[heapsReport]] (first = per-key MIN, additive like the
    * counts).
    */
  def initStore(corpus: DataFrame, groupCol: String, idCol: String,
      textCol: String, path: String): Unit = {
    write(Lexical.wordCounts(corpus, groupCol, textCol), "wc", -1L, path,
      init = true)
    write(Lexical.dupLedger(corpus, groupCol, textCol), "dl", -1L, path,
      init = true)
    write(Lexical.wordFirstDoc(corpus, groupCol, idCol, textCol), "fw",
      -1L, path, init = true)
    write(Lexical.docTokenCounts(corpus, groupCol, idCol, textCol), "dt",
      -1L, path, init = true)
  }

  /** The foreachBatch body: append this batch's tables idempotently and
    * return the card INCLUDING the batch (eager, so the caller sees the
    * post-ingest state even if the append is replayed later).
    */
  def processBatch(batch: DataFrame, batchId: Long, groupCol: String,
      idCol: String, textCol: String, path: String): DataFrame = {
    val spark = batch.sparkSession
    val wc = Lexical.wordCounts(batch, groupCol, textCol)
      .localCheckpoint(true) // consumed by the report AND the append
    val dl = Lexical.dupLedger(batch, groupCol, textCol)
      .localCheckpoint(true)
    val card = Lexical.corpusCard(
      standing(spark, path, "wc", batchId).unionByName(wc),
      standing(spark, path, "dl", batchId).unionByName(dl))
      .localCheckpoint(true) // eager: card before this batch lands
    write(wc, "wc", batchId, path, init = false)
    write(dl, "dl", batchId, path, init = false)
    write(Lexical.wordFirstDoc(batch, groupCol, idCol, textCol), "fw",
      batchId, path, init = false)
    write(Lexical.docTokenCounts(batch, groupCol, idCol, textCol), "dt",
      batchId, path, init = false)
    card
  }

  /** The store's current card (all standing batches merged). */
  def report(spark: SparkSession, path: String): DataFrame =
    Lexical.corpusCard(
      standing(spark, path, "wc", Long.MinValue),
      standing(spark, path, "dl", Long.MinValue))

  /** Zipf rank-frequency fit straight off the store's merged word
    * counts — equal to the batch [[Lexical.zipfSlope]] of everything
    * ingested (counts are additive; the fit reads only exact merged
    * counts).
    */
  def zipfReport(spark: SparkSession, path: String,
      topV: Int = 64): DataFrame =
    Lexical.zipfSlopeFromCounts(
      standing(spark, path, "wc", Long.MinValue), topV)

  /** Heaps'-law vocabulary-growth fit off the store's merged
    * first-occurrence and doc-token tables — equal to the batch
    * [[Lexical.heapsLaw]] of everything ingested (first occurrence
    * merges by MIN, token counts by SUM; the fit reads only the exact
    * merged tables).
    */
  def heapsReport(spark: SparkSession, path: String,
      points: Int = 10): DataFrame =
    Lexical.heapsLawFromTables(
      standing(spark, path, "fw", Long.MinValue),
      standing(spark, path, "dt", Long.MinValue), points)

  /** Fold every standing partition back into `ingest_batch = -1`. */
  def compact(spark: SparkSession, path: String): Unit = {
    val spark0 = spark
    def fold(table: String, keys: Seq[String], valueCol: String,
        agg: org.apache.spark.sql.Column): Unit = {
      val merged = standing(spark0, path, table, Long.MinValue)
        .groupBy(keys.map(col): _*)
        .agg(agg.as(valueCol))
        .localCheckpoint(true) // read fully before the overwrite
      write(merged, table, -1L, path, init = true)
    }
    fold("wc", Seq("group", "w"), "c", sum(col("c")))
    fold("dl", Seq("group", "h"), "c", sum(col("c")))
    fold("fw", Seq("group", "w"), "fd", min(col("fd")))
    fold("dt", Seq("group", "__id"), "t", sum(col("t")))
  }
}
