package graft.sources

import java.io.ByteArrayInputStream
import java.time.LocalDate

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.EdgarFunctions

/** Bulk tar feed scan — the `download_all=True` path
  * (`core/_index.py:215-304`): the reference downloads each day's
  * `{yyyymmdd}.nc.tar.gz`, unpacks with a thread pool into a temp dir,
  * and moves `{accession}.{nc|corr01-04}` members into the
  * `{cik}/{accession}` pattern tree.
  *
  * Spark shape: a `binaryFile` scan over the mirrored feed archives and a
  * streaming `flatMap` untar — no temp files, no driver bottleneck; each
  * task unpacks its archives in place and the pattern-tree move becomes a
  * relational join + [[graft.sink.PatternSink.writeExact]]. Member `.nc`
  * payloads are SGML filing containers, so rows feed straight into
  * [[graft.parse.MetaParser.explodeContainers]].
  *
  * Scale note: one archive is one input split (binaryFile does not split
  * files), so parallelism = number of feed days scanned; a quarter is ~65
  * archives → fine for a 1000-executor fan-out over years of feed.
  */
object TarFeedReader {

  /** Daily feed URL with the availability floor (`daily.py:108-116`):
    * bulk feeds exist only from 1995 Q3 on.
    */
  def dailyTarUrl(date: LocalDate): String = {
    val q = (date.getMonthValue - 1) / 3 + 1
    if (date.getYear < 1995 || (date.getYear == 1995 && q < 3))
      throw new IllegalArgumentException(
        "Bulk downloading is only available starting 1995 Q3.")
    f"Archives/edgar/Feed/${date.getYear}%d/QTR$q%d/" +
      f"${date.getYear}%04d${date.getMonthValue}%02d${date.getDayOfMonth}%02d.nc.tar.gz"
  }

  /** Quarterly feed discovery (`quarterly.py:95-99`): scrape every
    * `nc.tar.gz` href out of the feed directory-listing page. The
    * reference soup-finds `<a>` tags; anchors here come from one regex
    * over the listing HTML.
    */
  def quarterlyTarUrls(listingHtml: String): Seq[String] =
    "<a[^>]*href=[\"']?([^\"'> ]*nc\\.tar\\.gz)[\"']?".r
      .findAllMatchIn(listingHtml).map(_.group(1)).toSeq

  /** Untar one archive's bytes → (member_name, content) rows, streaming:
    * entries are read one at a time off the decompressor, never the whole
    * archive into memory.
    */
  def untar(bytes: Array[Byte]): Iterator[(String, Array[Byte])] = {
    val in = new TarArchiveInputStream(
      new GzipCompressorInputStream(new ByteArrayInputStream(bytes)))
    Iterator.continually(in.getNextEntry)
      .takeWhile(_ != null)
      .filter(e => !e.isDirectory)
      .map(e => (e.getName, in.readAllBytes()))
  }

  /** `binaryFile` scan over mirrored feed archives → one row per member:
    * (tar_path, member_name, content).
    */
  def readTarMembers(spark: SparkSession, pathGlob: String): DataFrame =
    membersOf(spark, spark.read.format("binaryFile").load(pathGlob))

  /** Same scan over a directory with a `pathGlobFilter` instead of a glob
    * baked into the path — avoids Hadoop's literal-path existence probe
    * (which WARN-logs a FileNotFoundException on glob paths) and keeps
    * partition discovery on the directory.
    */
  def readTarMembersDir(spark: SparkSession, dir: String,
      globFilter: String): DataFrame =
    membersOf(spark, spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter).load(dir))

  private def membersOf(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) => untar(b).map { case (n, c) => (p, n, c) } }
      .toDF("tar_path", "member_name", "content")
  }

  /** Member-ending preference (`_index.py:292-303`): for each accession
    * keep the first of `.nc`, `.corr04` … `.corr01` present. Returns one
    * row per accession: (accession_number, ending, content, tar_path).
    */
  def resolveMembers(members: DataFrame): DataFrame = {
    val endings = Seq("nc", "corr04", "corr03", "corr02", "corr01")
    val rankExpr = endings.zipWithIndex.foldLeft(lit(endings.size)) {
      case (acc, (e, i)) => when(col("ending") === e, i).otherwise(acc)
    }
    val parsed = members
      .withColumn("accession_number",
        regexp_extract(col("member_name"), "([^/]+)\\.[^./]+$", 1))
      .withColumn("ending", regexp_extract(col("member_name"), "\\.([^./]+)$", 1))
      .filter(col("ending").isin(endings: _*))
      .withColumn("__rank", rankExpr)
    EdgarFunctions.perKeyTopK(parsed, 1, Seq("accession_number"),
      Seq(col("__rank").asc, col("member_name")))
      .drop("__rank")
      .select(col("accession_number"), col("ending"), col("content"),
        col("tar_path"), col("member_name"))
  }

  /** Re-key resolved members to the pattern tree (`_move_to_dest`,
    * `_index.py:261-304`): join the day's entries (cik + file_name) on
    * accession, producing the columns
    * [[graft.sink.PatternSink.writeExact]] templates with
    * `{cik}`/`{accession_number}`. Entries per day are small relative to
    * member payloads → broadcast.
    */
  def rekey(resolved: DataFrame, entries: DataFrame): DataFrame = {
    // the reference keys members by the accession BEFORE the extension
    // (`filepath = link_accession.split('.')[0]`, `_index.py:291`) but
    // names destination files with the full `…​.txt` accession
    val keys = broadcast(entries
      .select(col("cik"), col("file_name"),
        EdgarFunctions.accessionNumber(col("file_name")).as("accession_full"))
      .withColumn("accession_number",
        regexp_replace(col("accession_full"), "\\..*$", "")))
    resolved.join(keys, Seq("accession_number"))
      .select(col("cik"), col("file_name"),
        col("accession_full").as("accession_number"), col("ending"),
        col("content"))
  }
}
