package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalizers for the `data.sec.gov` REST JSON documents
  * (`core/rest.py:51-205`). The fetch itself is a [[graft.fetch.Fetcher]]
  * concern; these functions turn raw JSON strings into relational,
  * columnar-friendly DataFrames.
  *
  * The reference keeps the documents as nested dicts and concatenates the
  * column-oriented parallel arrays driver-side (`_combine_dicts`,
  * `rest.py:27-48`); here the parallel arrays are `arrays_zip`'d and
  * exploded into rows, and continuation files are just more rows UNIONed in
  * — no driver-side merging, scales with partitions.
  */
object RestReader {

  // --- submissions (`rest.py:51-88`) --------------------------------------

  private val recentType = StructType(Seq(
    StructField("accessionNumber", ArrayType(StringType)),
    StructField("form", ArrayType(StringType)),
    StructField("filingDate", ArrayType(StringType)),
    StructField("reportDate", ArrayType(StringType)),
    StructField("primaryDocument", ArrayType(StringType)),
    StructField("isXBRL", ArrayType(LongType))))

  private val submissionsType = StructType(Seq(
    StructField("cik", StringType),
    StructField("name", StringType),
    StructField("filings", StructType(Seq(
      StructField("recent", recentType),
      StructField("files", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("filingCount", LongType))))))))))

  /** The `recent` block's parallel arrays, one row per filing. Continuation
    * documents (`filings.files[]`, fetched separately) share the flat shape
    * of `recent` and union straight in.
    */
  def submissions(raw: DataFrame, jsonCol: String = "value"): DataFrame = {
    val parsed = raw.select(from_json(col(jsonCol), submissionsType).as("s"))
    parsed.select(
      col("s.cik").as("cik"), col("s.name").as("name"),
      explode(arrays_zip(
        col("s.filings.recent.accessionNumber").as("accession_number"),
        col("s.filings.recent.form").as("form"),
        col("s.filings.recent.filingDate").as("filing_date"),
        col("s.filings.recent.reportDate").as("report_date"),
        col("s.filings.recent.primaryDocument").as("primary_document"),
        col("s.filings.recent.isXBRL").as("is_xbrl"))).as("f"))
      .select(col("cik"), col("name"), col("f.*"))
      .withColumn("filing_date", to_date(col("filing_date"), "yyyy-MM-dd"))
  }

  // --- company concept (`rest.py:91-123`) ----------------------------------

  private val factType = StructType(Seq(
    StructField("val", DoubleType),
    StructField("accn", StringType),
    StructField("fy", LongType),
    StructField("fp", StringType),
    StructField("form", StringType),
    StructField("filed", StringType),
    StructField("start", StringType),
    StructField("end", StringType)))

  private val conceptType = StructType(Seq(
    StructField("cik", LongType),
    StructField("taxonomy", StringType),
    StructField("tag", StringType),
    StructField("units", MapType(StringType, ArrayType(factType)))))

  /** `units.<ccy>[]` exploded: one row per (unit, fact). */
  def companyConcept(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(from_json(col(jsonCol), conceptType).as("c"))
      .select(col("c.cik").cast(StringType).as("cik"), col("c.taxonomy"),
        col("c.tag"), explode(col("c.units")).as(Seq("unit", "facts")))
      .select(col("cik"), col("taxonomy"), col("tag"), col("unit"),
        explode(col("facts")).as("f"))
      .select(col("cik"), col("taxonomy"), col("tag"), col("unit"), col("f.*"))

  // --- company facts (`rest.py:126-156`) -----------------------------------

  private val factsType = StructType(Seq(
    StructField("cik", LongType),
    StructField("entityName", StringType),
    StructField("facts", MapType(StringType, // taxonomy
      MapType(StringType, // tag
        StructType(Seq(
          StructField("label", StringType),
          StructField("units", MapType(StringType, ArrayType(factType))))))))))

  /** Three explodes: taxonomy map → tag map → unit facts array. */
  def companyFacts(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(from_json(col(jsonCol), factsType).as("c"))
      .select(col("c.cik").cast(StringType).as("cik"),
        col("c.entityName").as("entity_name"),
        explode(col("c.facts")).as(Seq("taxonomy", "tags")))
      .select(col("cik"), col("entity_name"), col("taxonomy"),
        explode(col("tags")).as(Seq("tag", "detail")))
      .select(col("cik"), col("entity_name"), col("taxonomy"), col("tag"),
        col("detail.label").as("label"),
        explode(col("detail.units")).as(Seq("unit", "facts")))
      .select(col("cik"), col("entity_name"), col("taxonomy"), col("tag"),
        col("label"), col("unit"), explode(col("facts")).as("f"))
      .select(col("cik"), col("entity_name"), col("taxonomy"), col("tag"),
        col("label"), col("unit"), col("f.*"))

  // --- XBRL frames (`rest.py:159-205`) --------------------------------------

  private val framesType = StructType(Seq(
    StructField("taxonomy", StringType),
    StructField("tag", StringType),
    StructField("ccp", StringType),
    StructField("uom", StringType),
    StructField("data", ArrayType(StructType(Seq(
      StructField("cik", LongType),
      StructField("entityName", StringType),
      StructField("val", DoubleType),
      StructField("accn", StringType),
      StructField("end", StringType)))))))

  def frames(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(from_json(col(jsonCol), framesType).as("c"))
      .select(col("c.taxonomy"), col("c.tag"), col("c.ccp"), col("c.uom"),
        explode(col("c.data")).as("d"))
      .select(col("taxonomy"), col("tag"), col("ccp"), col("uom"),
        col("d.cik").cast(StringType).as("cik"),
        col("d.entityName").as("entity_name"), col("d.val").as("val"),
        col("d.accn").as("accn"), col("d.end").as("end"))

  /** Frame period string `CY{y}[Qq][I]` (`rest.py:159-205`). */
  def framePeriod(year: Column, quarter: Column, instantaneous: Column): Column =
    concat(lit("CY"), year.cast(StringType),
      when(quarter.isNotNull, concat(lit("Q"), quarter.cast(StringType),
        when(instantaneous, lit("I")).otherwise(lit(""))))
        .otherwise(lit("")))
}
