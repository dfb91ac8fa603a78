package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source freshness checks (dbt's `source freshness` semantics): how
  * stale is each source table / partition, judged by its newest row.
  * Ref behavior: the reference re-runs models on file change
  * (watcher.py) but has no data-level staleness check; this closes that
  * operational gap for lake tables where "the file changed" and "new
  * data arrived" differ.
  *
  * `asOf` is an explicit column (usually a literal) rather than now():
  * deterministic runs, replayable checks, and oracle-friendly. Status
  * thresholds follow dbt: age > errorAfter → "error", > warnAfter →
  * "warn", else "ok"; a group with only NULL timestamps has NULL age
  * and status "error" (no evidence of freshness IS the alarm case).
  *
  * Scale shape: one grouped max over the timestamp column — the scan
  * prunes to (groupCol, tsCol), and partition-pruned sources check in
  * O(recent partitions) when the caller pre-filters.
  */
object Freshness {

  /** Per-group freshness: groupCol, max_ts_us, age_us, status. Age is
    * kept in exact integer MICROSECONDS (a seconds division would be a
    * double in Spark but integer in DuckDB — exactly the class of
    * cross-engine drift the ExactAgg discipline bans). */
  def check(
      df: DataFrame, tsCol: String, groupCol: String, asOf: Column,
      warnAfterS: Long, errorAfterS: Long): DataFrame = {
    require(warnAfterS <= errorAfterS,
      "warnAfter must not exceed errorAfter")
    val asOfUs = unix_micros(asOf)
    df.groupBy(col(groupCol))
      .agg(max(unix_micros(col(tsCol))).as("max_ts_us"))
      .withColumn("age_us", asOfUs - col("max_ts_us"))
      .withColumn("status",
        when(col("age_us").isNull ||
          col("age_us") > errorAfterS * 1000000L, "error")
          .when(col("age_us") > warnAfterS * 1000000L, "warn")
          .otherwise("ok"))
      .select(col(groupCol), col("max_ts_us"), col("age_us"), col("status"))
  }

  /** Whole-table freshness (dbt `source freshness` on an ungrouped
    * source): one row of (max_ts_us, age_us, status). Same thresholds
    * and NULL semantics as [[check]]; a global aggregate instead of a
    * grouped one — the scan still prunes to the single timestamp
    * column, and the aggregate is a constant-size partial per
    * partition. An EMPTY table yields NULL max_ts → "error" (a source
    * with no rows at all has no evidence of freshness). */
  def checkTable(
      df: DataFrame, tsCol: String, asOf: Column,
      warnAfterS: Long, errorAfterS: Long): DataFrame = {
    require(warnAfterS <= errorAfterS,
      "warnAfter must not exceed errorAfter")
    df.agg(max(unix_micros(col(tsCol))).as("max_ts_us"))
      .withColumn("age_us", unix_micros(asOf) - col("max_ts_us"))
      .withColumn("status",
        when(col("age_us").isNull ||
          col("age_us") > errorAfterS * 1000000L, "error")
          .when(col("age_us") > warnAfterS * 1000000L, "warn")
          .otherwise("ok"))
  }
}
