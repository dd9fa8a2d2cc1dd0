package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented operator from SURVEY.md §2 (plus the
  * north-star LLM-pipeline operators) to a DataFrame program over the
  * testdata tables; `oracleSql` carries the DuckDB-equivalent SQL for the
  * hash-compare gate. Query groups live under [[graft.queries]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.ParseQueries.queries ++
      graft.queries.LmQueries.queries ++
      graft.queries.SketchQueries.queries ++
      graft.queries.SelectionQueries.queries ++
      graft.queries.CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++
      graft.queries.ParseQueries.oracles ++
      graft.queries.LmQueries.oracles ++
      graft.queries.SketchQueries.oracles ++
      graft.queries.SelectionQueries.oracles ++
      graft.queries.CurationQueries.oracles
}
