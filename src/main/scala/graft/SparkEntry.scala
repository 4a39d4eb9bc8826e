package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CoreQueries, DedupQueries, EventQueries, MultimodalQueries, PipelineQueries, SamplingQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ EventQueries.queries ++ MultimodalQueries.queries ++
      SamplingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ PipelineQueries.oracleSql ++ TextQueries.oracleSql ++
      DedupQueries.oracleSql ++ EventQueries.oracleSql ++ MultimodalQueries.oracleSql ++
      SamplingQueries.oracleSql
}
