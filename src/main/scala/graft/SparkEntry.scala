package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, CoreQueries, CorpusGraphQueries, CurationQueries, ExtraQueries, FrameworkQueries, IndexingQueries, LlmOpsQueries, RetrievalQueries, ScaleQueries, TemporalQueries, TrainingPrepQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryModule's checkable queries. Each query key maps
  * to a SURVEY.md §2 inventory row; entries with oracle SQL are
  * hash-compared against DuckDB by the driver.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    CoreQueries, FrameworkQueries, LlmOpsQueries, ExtraQueries,
    TemporalQueries, ScaleQueries, CurationQueries, RetrievalQueries,
    TrainingPrepQueries, IndexingQueries, AnalyticsQueries,
    CorpusGraphQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The composed raw-crawl → training-corpus funnel
    * (dedup → decontaminate → quality → split → pack) exercises the
    * engine end to end; oracle-verified as q_curate_pipeline. */
  def entry(spark: SparkSession): DataFrame =
    CurationQueries.queries("q_curate_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    val dupes = all.groupBy(_._1).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query keys across modules: $dupes")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
