package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticQueries, CoreQueries, DedupQueries, MultimodalQueries, PipelineQueries, QualityQueries, RelationalQueries, SimQueries, StreamingQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has an entry in
  * [[queries]]; SQL-expressible ones have a DuckDB oracle in
  * [[oracleSql]] (same column names both sides — the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ RelationalQueries.queries ++
      QualityQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimQueries.queries ++
      MultimodalQueries.queries ++ PipelineQueries.queries ++
      AnalyticQueries.queries ++ StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ RelationalQueries.oracles ++
      QualityQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ SimQueries.oracles ++
      MultimodalQueries.oracles ++ PipelineQueries.oracles ++
      AnalyticQueries.oracles ++ StreamingQueries.oracles
}
