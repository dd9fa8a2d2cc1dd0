package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational ports of the reference's row-pipeline operators
  * (SURVEY.md §2.4-2.8): entry filters, the running kept-count, the
  * group-by-CIK, the union-by-key merge, the CIK lookup join, per-key
  * top-k, and the emptiness assertion.
  */
object EntryOps {

  /** Thrown when a query resolves zero filings
    * (`core/_base.py:92-106` `get_urls_safely` → NoFilingsError).
    */
  final class NoFilingsError(msg: String) extends RuntimeException(msg)

  /** `entry_filter` (`core/_index.py:46-59,170-172`): any Column predicate.
    * Column form (not a closure) keeps Catalyst pushdown — the filter
    * reaches the parquet/text scan before grouping or fetching, exactly the
    * reference's "filter before download" optimization (`_index.py:170-172`)
    * but done by the optimizer.
    */
  def entryFilter(df: DataFrame, predicate: Column): DataFrame =
    df.filter(predicate)

  /** `num_previously_valid` (`_index.py:160,169,173`): 0-based index of the
    * row among *kept* rows in source order. Apply AFTER the entry filter.
    *
    * Scale note: with no `partitionCols` this is a single-partition global
    * sort — correct but a bottleneck at 100 TB. Real ingest partitions by
    * source file (`input_file_name`), which keeps the window parallel and
    * matches the reference's per-idx-file numbering anyway.
    */
  def withRunningCount(
      df: DataFrame,
      orderCol: String,
      partitionCols: Seq[String] = Nil,
      outCol: String = "num_previously_valid"): DataFrame = {
    val w0 = if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionCols.map(col): _*)
    df.withColumn(outCol, row_number().over(w0.orderBy(col(orderCol))) - 1)
  }

  /** Group-by-CIK preserving idx order (`_index.py:174-178`): per-CIK list
    * of entry structs sorted by source line number. Relational form stays
    * flat until this edge materialization — one shuffle on `cik`.
    */
  def groupByCik(entries: DataFrame, valueCols: Seq[String],
      orderCol: String = "line_no"): DataFrame = {
    val st = struct((col(orderCol) +: valueCols.map(col)): _*)
    entries
      .groupBy(col("cik"))
      .agg(transform(array_sort(collect_list(st)),
        e => e.dropFields(orderCol)).as("entries"))
  }

  /** Per-key URL-list union (`core/combo.py:211-240` `_reducer`,
    * `core/rest.py:27-48` `_combine_dicts`): relationally just UNION ALL —
    * the grouped edge shape is re-derived by `groupByCik` when needed,
    * avoiding any driver-side dict merging.
    */
  def unionByKey(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))

  /** CIK lookup join (`cik_lookup.py:195-226`) with the reference's
    * precedence: all-digit lookups pass through, then ticker match, then
    * title match; unresolved are dropped (the HTML-scrape fallback is a
    * fetch-layer concern). The dimension is broadcast — at 100 TB the fact
    * side never shuffles for this join.
    *
    * @param lookups  DataFrame with a string `lookup` column.
    * @param cikMap   dimension from [[graft.sources.CikMapReader]]
    *                 (`cik`, `ticker`, `title`, both keys upper-cased).
    */
  def resolveCiks(lookups: DataFrame, cikMap: DataFrame): DataFrame = {
    val lk = upper(col("lookup"))
    val byTicker = broadcast(cikMap.select(col("ticker").as("__t"),
      col("cik").as("__cik_t")))
    val byTitle = broadcast(cikMap.select(col("title").as("__n"),
      col("cik").as("__cik_n")))
    lookups
      .join(byTicker, lk === col("__t"), "left")
      .join(byTitle, lk === col("__n"), "left")
      .withColumn("cik", coalesce(
        when(lk.rlike("^[0-9]+$"), col("lookup")),
        col("__cik_t"), col("__cik_n")))
      .filter(col("cik").isNotNull) // unresolved lookups dropped (warned in ref)
      .select(col("lookup"), col("cik"))
  }

  /** [[resolveCiks]] plus the reference's HTML-scrape fallback
    * (`cik_lookup.py:107-174`): lookups the ticker/title maps miss fetch
    * their browse-edgar company page through the rate-limited fetch layer
    * and scrape with [[graft.sources.CikScraper]]. Multiple-candidate
    * pages warn-and-skip (scrape yields null → dropped), no-result pages
    * likewise. The unresolved fraction is tiny relative to the lookup
    * set, so the fetch fan-out stays small; map hits and digit CIKs never
    * touch the network (`test_cik_lookup.py:119-128` bypass semantics).
    */
  def resolveCiksWithFallback(lookups: DataFrame, cikMap: DataFrame,
      fetch: graft.fetch.Fetcher.FetchFn, urlFor: String => String,
      globalRate: Double = 10.0): DataFrame = {
    val resolved = resolveCiks(lookups, cikMap)
    val unresolved = lookups
      .join(resolved.select("lookup"), Seq("lookup"), "left_anti")
    val toUrl = udf(urlFor)
    val scrapeCik = udf(graft.sources.CikScraper.scrapeCikOrNull _)
    val scraped = graft.fetch.Fetcher.fetchAll(
      unresolved.select(col("lookup").as("key"), toUrl(col("lookup")).as("url")),
      fetch, globalRate)
      .filter(col("error").isNull)
      .select(col("key").as("lookup"),
        scrapeCik(col("content").cast("string")).as("cik"))
      .filter(col("cik").isNotNull)
    resolved.unionByName(scraped)
  }

  /** Per-key `count` limit (`core/company.py:287-303`): top-k per group via
    * row_number — NOT a global limit. `order` must be total for
    * deterministic output.
    */
  def perKeyLimit(df: DataFrame, keys: Seq[String], order: Seq[Column],
      k: Int): DataFrame =
    graft.functions.EdgarFunctions.perKeyTopK(df, k, keys, order)

  /** `get_urls_safely` emptiness check (`core/_base.py:92-106`). */
  def assertNonEmpty(df: DataFrame, what: String = "query"): DataFrame = {
    if (df.isEmpty) throw new NoFilingsError(s"No filings available for $what")
    df
  }
}
