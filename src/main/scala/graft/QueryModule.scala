package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Each entry in [[queries]] is a function (session, sfDir) => result;
  * entries present in [[oracleSql]] are hash-compared against DuckDB
  * running the same SQL over the same parquet tables, so column names,
  * types, row order, and float arithmetic must be reproducible on both
  * engines (see ExactAgg and SURVEY.md §5). Entries absent from
  * [[oracleSql]] get a weaker rows-only check.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
