package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.EdgarFunctions

/** Pattern-templated sinks (`core/_index.py:306-348`, `core/daily.py:134-166`,
  * `core/quarterly.py:101-134`): the reference saves each filing under
  * `{dir_pattern}/{file_pattern}` with options {cik}, {date}, {year},
  * QTR{quarter}, {accession_number}, {type}.
  *
  * Two tiers:
  *   - [[writeAnalytic]]: the 100 TB path — parquet `partitionBy` on the
    *   pattern columns; partition pruning then serves date/cik predicates
  *     for free (the combo planner's work, done by the storage layout);
  *   - [[writeExact]]: byte-exact file-tree layout via `foreachPartition`,
  *     for drop-in parity with the reference's output directory shape.
  */
object PatternSink {

  /** Expand a reference-style pattern ("{cik}", "{year}/QTR{quarter}/{cik}",
    * "{accession_number}") into a Column over the row's fields.
    */
  def patternColumn(pattern: String, dateFormat: String = "yyyyMMdd"): Column = {
    val token = "\\{(cik|date|year|quarter|accession_number|type)\\}".r
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var idx = 0
    for (m <- token.findAllMatchIn(pattern)) {
      if (m.start > idx) parts += lit(pattern.substring(idx, m.start))
      parts += (m.group(1) match {
        case "cik" => col("cik")
        case "date" => date_format(col("date_filed"), dateFormat)
        case "year" => year(col("date_filed")).cast("string")
        case "quarter" => quarter(col("date_filed")).cast("string")
        case "accession_number" => EdgarFunctions.accessionNumber(col("file_name"))
        case "type" => col("form_type")
      })
      idx = m.end
    }
    if (idx < pattern.length) parts += lit(pattern.substring(idx))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** Analytic tier: parquet partitioned by (year, quarter, cik) — the
    * layout Catalyst prunes with `date_filed`/`cik` predicates.
    */
  def writeAnalytic(entries: DataFrame, directory: String): Unit =
    entries
      .withColumn("year", year(col("date_filed")))
      .withColumn("quarter", quarter(col("date_filed")))
      .write.mode("overwrite")
      .partitionBy("year", "quarter", "cik")
      .parquet(directory)

  /** Exact tier: reproduce the reference's file tree. Input must carry the
    * entry columns plus a `content` column (string or binary). Runs fully
    * parallel — each task writes its partition's files; directory creation
    * is idempotent.
    */
  def writeExact(entries: DataFrame, directory: String,
      dirPattern: String = "{cik}", filePattern: String = "{accession_number}",
      dateFormat: String = "yyyyMMdd"): Unit = {
    // NOTE: clean_directory_path applies to name-derived *components*
    // (company.py uses it on company names), never the whole pattern —
    // callers sanitize their own columns before templating.
    val planned = entries.withColumn("__dir", patternColumn(dirPattern, dateFormat))
      .withColumn("__file", patternColumn(filePattern, dateFormat))
      .select(col("__dir"), col("__file"), col("content"))
    planned.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      rows.foreach { r =>
        val dir = Paths.get(directory, r.getString(0))
        Files.createDirectories(dir)
        val bytes = r.get(2) match {
          case b: Array[Byte] => b
          case s: String => s.getBytes(StandardCharsets.UTF_8)
          case null => Array.emptyByteArray
        }
        Files.write(dir.resolve(r.getString(1)), bytes)
      }
    }
  }
}
