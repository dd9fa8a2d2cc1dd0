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

  /** Zip-explode a recent-shaped struct column (parallel arrays → rows);
    * shared by the `recent` block and continuation documents.
    */
  private def zipRecent(df: DataFrame, recentCol: Column): DataFrame =
    df.select(col("cik"), col("name"),
      explode(arrays_zip(
        recentCol.getField("accessionNumber").as("accession_number"),
        recentCol.getField("form").as("form"),
        recentCol.getField("filingDate").as("filing_date"),
        recentCol.getField("reportDate").as("report_date"),
        recentCol.getField("primaryDocument").as("primary_document"),
        recentCol.getField("isXBRL").as("is_xbrl"))).as("f"))
      .select(col("cik"), col("name"), col("f.*"))
      .withColumn("filing_date", to_date(col("filing_date"), "yyyy-MM-dd"))

  /** The `recent` block's parallel arrays, one row per filing. Continuation
    * documents (`filings.files[]`, fetched separately) share the flat shape
    * of `recent` and union straight in.
    */
  def submissions(raw: DataFrame, jsonCol: String = "value"): DataFrame = {
    val parsed = raw.select(from_json(col(jsonCol), submissionsType).as("s"))
      .select(col("s.cik").as("cik"), col("s.name").as("name"),
        col("s.filings.recent").as("r"))
    zipRecent(parsed, col("r"))
  }

  /** `recent=False` (`rest.py:59-88`): fan out to the continuation files
    * named in `filings.files[]`, parse each as a bare recent-shaped
    * document, and union with the recent rows. The reference concatenates
    * the parallel arrays driver-side (`_combine_dicts`, `rest.py:27-48`);
    * here every continuation document explodes to rows independently on
    * executors and the union is order-free — no driver-side merge state.
    *
    * @param urlFor continuation file name → URL
    *               (`rest.py:82`: `url_base + files[i].name`).
    */
  def submissionsAll(raw: DataFrame, fetch: graft.fetch.Fetcher.FetchFn,
      urlFor: String => String, globalRate: Double = 10.0,
      jsonCol: String = "value"): DataFrame = {
    val parsed = raw.select(from_json(col(jsonCol), submissionsType).as("s"))
    val entities = parsed
      .select(col("s.cik").as("cik"), col("s.name").as("name")).distinct()
    val toUrl = udf(urlFor)
    val work = parsed
      .select(col("s.cik").as("key"), explode(col("s.filings.files")).as("f"))
      .select(col("key"), toUrl(col("f.name")).as("url"))
    val cont = graft.fetch.Fetcher.fetchAll(work, fetch, globalRate)
      .filter(col("error").isNull)
      .select(col("key").as("cik"),
        from_json(col("content").cast(StringType), recentType).as("r"))
      // continuation documents carry no cik/name — re-key from the parent
      // submissions row (entity dim is small → broadcast)
      .join(broadcast(entities), Seq("cik"), "left")
    submissions(raw, jsonCol).unionByName(zipRecent(cont, col("r")))
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
