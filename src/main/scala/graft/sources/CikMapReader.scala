package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the `company_tickers.json` CIK map (`cik_lookup.py:10-37`).
  *
  * The file is one JSON object keyed by row index:
  * `{"0": {"cik_str": 320193, "ticker": "AAPL", "title": "Apple Inc."}, …}`
  * — so `spark.read.json` would produce one row with thousands of columns.
  * Instead we parse it as `Map[String, struct]` and explode the values.
  * Keys are upper-cased like the reference; null tickers/titles are kept as
  * rows (the join simply won't match them, mirroring the reference's
  * dict-comprehension skip).
  *
  * The result is a small dimension — cache + `broadcast()` it for the
  * lookup join ([[graft.ops.EntryOps.resolveCiks]]); the reference's
  * `lru_cache` memoization maps to `.cache()`.
  */
object CikMapReader {

  private val entryType = StructType(Seq(
    StructField("cik_str", LongType),
    StructField("ticker", StringType),
    StructField("title", StringType)))

  def fromJsonStrings(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw
      .select(explode(map_values(
        from_json(col(jsonCol), MapType(StringType, entryType)))).as("v"))
      .select(
        col("v.cik_str").cast(StringType).as("cik"),
        upper(col("v.ticker")).as("ticker"),
        upper(col("v.title")).as("title"))

  def read(spark: SparkSession, path: String): DataFrame =
    fromJsonStrings(spark.read.option("wholetext", "true").text(path))
}
