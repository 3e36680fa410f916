package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every key in [[queries]]
  * with a SQL-expressible semantics also appears in [[oracleSql]] with
  * identical output column names (the driver sorts columns by name
  * before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinRevenuePerNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ WindowQueries.queries ++ NormalizeQueries.queries ++
      Serving.queries ++ PipelineQueries.queries ++ CurationQueries.queries ++
      Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ WindowQueries.oracle ++ NormalizeQueries.oracle ++
      Serving.oracle ++ PipelineQueries.oracle ++ CurationQueries.oracle ++
      Analytics.oracle
}
