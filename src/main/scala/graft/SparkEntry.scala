package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full query roster from the per-family objects under
  * [[graft.queries]]; each key has a matching DuckDB oracle in
  * [[oracleSql]] unless the operator is not SQL-expressible (LSH,
  * sketches, streaming), in which case the driver records a weaker
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 skeleton: parquet scan → pushed filter → partial+final
    * hash aggregate (SURVEY.md §7.2).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_battery")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.EventQueries.oracleSql ++
      graft.queries.DedupQueries.oracleSql ++
      graft.queries.SimilarityQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql
}
