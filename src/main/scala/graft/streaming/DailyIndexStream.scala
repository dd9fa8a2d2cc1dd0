package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.EdgarFunctions

/** Structured Streaming surface (SURVEY.md §2.10): the reference's closest
  * pattern is the daily-index poll ("new filings for date D",
  * `core/daily.py:8-60`), which maps naturally to a file-source stream
  * over the mirrored daily-index directory — each newly landed idx file
  * becomes one micro-batch.
  *
  * At scale this replaces cron-driven re-scans: the file source tracks
  * processed files in the checkpoint, filters/parsing are identical
  * Columns to the batch tier, and downstream windowed aggregations carry
  * watermarks for late filings.
  */
object DailyIndexStream {

  val rawSchema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Stream of parsed FilingEntry rows from idx files landing in `path`.
    * (File-source streams read line-wise; per-file line order is not
    * needed here — running counts are a batch concern.)
    */
  def entries(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", 16)
      .text(path)
      // line numbers are a batch-tier concern (running counts); streaming
      // sources forbid monotonically_increasing_id
      .withColumn("line_no", lit(0L))
    EdgarFunctions.parseIdxLines(lines)
  }

  /** Tumbling daily counts per form type with a late-data watermark — the
    * streaming analog of the per-day filing counts a poller computes.
    */
  def dailyFormCounts(entries: DataFrame, watermark: String = "3 days"): DataFrame =
    entries
      .withColumn("ts", col("date_filed").cast(TimestampType))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day"), col("form_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast(DateType).as("day"),
        col("form_type"), col("n"))
}
