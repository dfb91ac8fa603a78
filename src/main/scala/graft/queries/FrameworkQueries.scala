package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{ExactAgg => X, QueryModule, Tables}
import graft.model._

/** Framework-semantics queries (SURVEY.md §2 B4, B6–B11): each one runs a
  * real model pipeline — template render → DAG → materialize into a
  * throwaway warehouse — and returns the final table, so the DuckDB
  * oracle checks the *engine semantics* (incremental watermarks, merge,
  * CDC retirement, backfill chunking), not just a query plan.
  *
  * Batch timestamps are fixed literals so results are deterministic.
  */
object FrameworkQueries extends QueryModule {

  /** Fresh throwaway warehouse + runner with testdata sources mapped.
    * Prefers a RAM-backed tmpfs for the throwaway warehouse: these
    * queries measure engine semantics (merge/retire/watermark logic),
    * not the disk, and shared-disk contention would otherwise dominate
    * the benchmark. */
  private def freshRunner(s: SparkSession, dir: String): (Warehouse, ModelRunner) = {
    Tables.registerAll(s, dir)
    val whDir = graft.Scratch.dir("graft_wh_")
    val state = StateStore(whDir + "/state")
    val wh = new Warehouse(s, whDir, state)
    val sources = Tables.names.map(t => ("raw", t) -> t).toMap
    (wh, new ModelRunner(wh, sources))
  }

  // ------------------------------------------------- B4: 3-model DAG run
  private def qModelPipeline(s: SparkSession, dir: String): DataFrame = {
    val (_, runner) = freshRunner(s, dir)
    runner.addModel("bronze_orders",
      """-- config: materialized=view
        |SELECT o_orderkey, o_custkey, o_totalprice
        |FROM {{ source('raw', 'orders') }}
        |WHERE o_totalprice > $min_price""".stripMargin)
    runner.addModel("silver_orders",
      """-- config: materialized=table
        |SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_mktsegment
        |FROM {{ ref('bronze_orders') }} o
        |JOIN {{ source('raw', 'customer') }} c ON o.o_custkey = c.c_custkey""".stripMargin)
    runner.addModel("gold_segment_revenue",
      s"""-- config: materialized=table
         |SELECT c_mktsegment,
         |  ${X.sqlSum("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM {{ ref('silver_orders') }}
         |GROUP BY c_mktsegment""".stripMargin)
    runner.run(variables = Map("min_price" -> "1000.0"))
    runner.readModel("gold_segment_revenue").orderBy("c_mktsegment")
  }

  private val qModelPipelineSql =
    s"""SELECT c_mktsegment,
       |  ${X.sqlSum("o_totalprice")} AS revenue,
       |  COUNT(*) AS n_orders
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |WHERE o_totalprice > 1000.0
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // ------------------------------- B15: bronze/silver/gold layer macros
  // The reference's Jinja macros (macros.py:96-198) as DataFrame
  // combinators, composed end-to-end: bronze_load (filter + load
  // metadata) → silver_clean (QUALIFY row_number keep-latest per key) →
  // gold_aggregate (named aggregates). One Catalyst plan; the oracle
  // re-derives all three layers in SQL.
  private def qMacros(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val bronze = Macros.bronzeLoad(ev, filter = Some(col("value") > 0))
    val silver = Macros.silverClean(bronze,
      dedupeKey = Seq("user_id", "event_type"),
      orderBy = Seq(col("ts").desc, col("event_id").desc))
    Macros.goldAggregate(silver,
      groupBy = Seq("event_type"),
      aggregates = Seq(
        "n_users" -> count(lit(1)),
        "latest_value_sum" -> X.dsum(col("value"))))
      .orderBy("event_type")
  }

  private val qMacrosSql =
    s"""SELECT event_type, COUNT(*) AS n_users,
       |  ${X.sqlSum("value")} AS latest_value_sum
       |FROM (
       |  SELECT event_type, value FROM (
       |    SELECT event_type, value,
       |      ROW_NUMBER() OVER (PARTITION BY user_id, event_type
       |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
       |    FROM events WHERE value > 0)
       |  WHERE rn = 1)
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // --------------------------------------- B6: incremental time watermark
  // Run 1 sees only events before the cutoff; run 2 sees everything. The
  // watermark must make the final table equal one full load: no
  // duplicates at the boundary, no lost rows.
  private def qIncrementalTime(s: SparkSession, dir: String): DataFrame = {
    val (wh, runner) = freshRunner(s, dir)
    val cutoff = "2024-01-15 00:00:00"
    runner.addModel("inc_events",
      """-- config: materialized=incremental, incremental_strategy=time, time_column=ts
        |SELECT ts, event_id, user_id, event_type, value
        |FROM {{ source('raw', 'events') }}
        |WHERE ts < TIMESTAMP '$upper'""".stripMargin)
    runner.run(variables = Map("upper" -> cutoff)) // initial load
    runner.run(variables = Map("upper" -> "2099-01-01 00:00:00")) // incremental
    runner.readModel("inc_events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), X.dsum(col("value")).as("sum_value"),
        max(unix_micros(col("ts"))).as("max_us"))
      .orderBy("event_type")
  }

  private val qIncrementalTimeSql =
    s"""SELECT event_type, COUNT(*) AS n, ${X.sqlSum("value")} AS sum_value,
       |  MAX(epoch_us(ts)) AS max_us
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------- B7: incremental unique_key merge
  // Latest-event-per-user, loaded in two halves; merge-by-key must yield
  // the same as one latest-per-user pass over everything (second half is
  // strictly later, so batch rows win for overlapping users).
  private val mergeModelSql =
    """-- config: materialized=incremental, incremental_strategy=unique_key, unique_key=user_id
      |SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM {{ source('raw', 'events') }}
      |  WHERE ts >= TIMESTAMP '$from' AND ts < TIMESTAMP '$to')
      |WHERE rn = 1""".stripMargin

  private def qIncrementalMerge(s: SparkSession, dir: String): DataFrame = {
    val (_, runner) = freshRunner(s, dir)
    runner.addModel("latest_per_user", mergeModelSql)
    runner.run(variables = Map("from" -> "2024-01-01 00:00:00", "to" -> "2024-01-15 00:00:00"))
    runner.run(variables = Map("from" -> "2024-01-15 00:00:00", "to" -> "2099-01-01 00:00:00"))
    runner.readModel("latest_per_user")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  private val qIncrementalMergeSql =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // --------------------------------------- B8: append + date-range backfill
  private def qBackfill(s: SparkSession, dir: String): DataFrame = {
    val (_, runner) = freshRunner(s, dir)
    runner.addModel("events_backfill",
      """-- config: materialized=incremental, incremental_strategy=append
        |SELECT event_id, ts, user_id, event_type, value
        |FROM {{ source('raw', 'events') }}
        |WHERE CAST(ts AS DATE) >= DATE '$start_date'
        |  AND CAST(ts AS DATE) <= DATE '$end_date'""".stripMargin)
    Backfill.run(runner, "events_backfill",
      java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-31"),
      intervalDays = 6)
    runner.readModel("events_backfill")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), X.dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  private val qBackfillSql =
    s"""SELECT event_type, COUNT(*) AS n, ${X.sqlSum("value")} AS sum_value
       |FROM events
       |WHERE CAST(ts AS DATE) >= DATE '2024-01-01' AND CAST(ts AS DATE) <= DATE '2024-01-31'
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------- B9/B10: CDC fixtures
  // Deterministic change feed derived from orders:
  //   k % 3 == 0             -> 'I' (new key, absent from the base load)
  //   else if k % 5 == 0     -> 'U' (price bumped by 1000.0 — exact IEEE)
  //   else if k % 7 == 0     -> 'D'
  private def cdcBase(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("price"))

  private def cdcBatch(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 3 === 0 || col("o_orderkey") % 5 === 0 ||
        col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderkey") % 3 =!= 0 && col("o_orderkey") % 5 === 0,
          col("o_totalprice") + lit(1000.0)).otherwise(col("o_totalprice")).as("price"),
        when(col("o_orderkey") % 3 === 0, "I")
          .when(col("o_orderkey") % 5 === 0, "U")
          .otherwise("D").as("__cdc_operation"))

  private val cdcOracleCtes =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice AS price
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |batch AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 3 <> 0 AND o_orderkey % 5 = 0
      |         THEN o_totalprice + 1000.0 ELSE o_totalprice END AS price,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'I'
      |         WHEN o_orderkey % 5 = 0 THEN 'U' ELSE 'D' END AS op
      |  FROM orders
      |  WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0 OR o_orderkey % 7 = 0)""".stripMargin

  private def qCdcMerge(s: SparkSession, dir: String): DataFrame = {
    val (wh, _) = freshRunner(s, dir)
    val mat = new Materializer(wh)
    val cfg = ModelConfig("orders_snapshot", materialized = "cdc",
      uniqueKey = Some("o_orderkey"))
    mat.materialize(cfg, cdcBase(s, dir))
    mat.materialize(cfg, cdcBatch(s, dir))
    wh.read("orders_snapshot").orderBy("o_orderkey")
  }

  private val qCdcMergeSql =
    s"""$cdcOracleCtes
       |SELECT o_orderkey, o_custkey, price FROM (
       |  SELECT b.o_orderkey, b.o_custkey, b.price FROM base b
       |  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM batch)
       |  UNION ALL
       |  SELECT o_orderkey, o_custkey, price FROM batch WHERE op <> 'D')
       |ORDER BY o_orderkey""".stripMargin

  private def qCdcScd2(s: SparkSession, dir: String): DataFrame = {
    val (wh, _) = freshRunner(s, dir)
    val mat = new Materializer(wh)
    val cfg = ModelConfig("orders_history", materialized = "cdc_scd2",
      uniqueKey = Some("o_orderkey"))
    mat.materialize(cfg, cdcBase(s, dir), batchTs = "2024-01-01 00:00:00")
    mat.materialize(cfg, cdcBatch(s, dir), batchTs = "2024-02-01 00:00:00")
    wh.read("orders_history")
      .select(col("o_orderkey"), col("o_custkey"), col("price"),
        col(Materializer.CdcTimestampCol).cast("date").as("valid_from"),
        col(Materializer.ObsoleteDateCol).cast("date").as("obsolete_date"),
        col(Materializer.ObsoleteDateCol).isNull.as("is_current"))
      .orderBy(col("o_orderkey"), col("valid_from"), col("is_current"))
  }

  private val qCdcScd2Sql =
    s"""$cdcOracleCtes,
       |hist AS (
       |  -- base rows never touched: still current from the initial load
       |  SELECT b.o_orderkey, b.o_custkey, b.price,
       |    DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS obsolete_date
       |  FROM base b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM batch WHERE op IN ('U','D'))
       |  UNION ALL
       |  -- base rows retired by an update or delete
       |  SELECT b.o_orderkey, b.o_custkey, b.price,
       |    DATE '2024-01-01', DATE '2024-02-01'
       |  FROM base b WHERE b.o_orderkey IN (SELECT o_orderkey FROM batch WHERE op IN ('U','D'))
       |  UNION ALL
       |  -- new versions inserted by the second batch
       |  SELECT o_orderkey, o_custkey, price, DATE '2024-02-01', CAST(NULL AS DATE)
       |  FROM batch WHERE op IN ('I','U'))
       |SELECT o_orderkey, o_custkey, price, valid_from, obsolete_date,
       |  (obsolete_date IS NULL) AS is_current
       |FROM hist
       |ORDER BY o_orderkey, valid_from, is_current""".stripMargin

  // ------------------------------------------------- B11: quality checks
  // The suite is DECLARED as `-- test:` headers on a model (reference
  // model.py TestConfig / testing.py run_model_tests) and parsed through
  // ModelConfig, so the oracle pins the whole declarative path: header →
  // TestSpec → Quality check → single-pass aggregate.
  private def qQualityChecks(s: SparkSession, dir: String): DataFrame = {
    val cfg = ModelConfig.fromSql("orders_checked",
      """-- config: materialized=table
        |-- test: unique(o_orderkey)
        |-- test: not_null(o_custkey)
        |-- test: accepted_values(o_orderstatus, F|O|P)
        |-- test: range(o_totalprice, 0.0, 400000.0)
        |-- test: relationships(o_custkey, customer, c_custkey)
        |SELECT * FROM {{ source('raw', 'orders') }}""".stripMargin)
    Quality.asRow(Tables.load(s, dir, "orders"), cfg.tests.map(_.toCheck),
      resolve = Tables.load(s, dir, _))
  }

  private val qQualityChecksSql =
    """SELECT check_name, failures FROM (
      |  SELECT 'unique_o_orderkey' AS check_name,
      |    CAST((SELECT COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT) AS failures
      |  UNION ALL
      |  SELECT 'not_null_o_custkey',
      |    CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
      |  UNION ALL
      |  SELECT 'accepted_values_o_orderstatus',
      |    CAST((SELECT COUNT(*) FROM orders
      |          WHERE o_orderstatus NOT IN ('F','O','P') OR o_orderstatus IS NULL) AS BIGINT)
      |  UNION ALL
      |  SELECT 'range_o_totalprice',
      |    CAST((SELECT COUNT(*) FROM orders
      |          WHERE o_totalprice < 0.0 OR o_totalprice > 400000.0) AS BIGINT)
      |  UNION ALL
      |  SELECT 'relationships_o_custkey__customer_c_custkey',
      |    CAST((SELECT COUNT(*) FROM orders
      |          WHERE o_custkey IS NOT NULL
      |            AND o_custkey NOT IN (SELECT c_custkey FROM customer
      |                                  WHERE c_custkey IS NOT NULL)) AS BIGINT))
      |ORDER BY check_name""".stripMargin

  // ----------------------------------------------------------------------
  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_model_pipeline" -> qModelPipeline _,
    "q_macros" -> qMacros _,
    "q_incremental_time" -> qIncrementalTime _,
    "q_incremental_merge" -> qIncrementalMerge _,
    "q_backfill" -> qBackfill _,
    "q_cdc_merge" -> qCdcMerge _,
    "q_cdc_scd2" -> qCdcScd2 _,
    "q_quality_checks" -> qQualityChecks _)

  override val oracleSql: Map[String, String] = Map(
    "q_model_pipeline" -> qModelPipelineSql,
    "q_macros" -> qMacrosSql,
    "q_incremental_time" -> qIncrementalTimeSql,
    "q_incremental_merge" -> qIncrementalMergeSql,
    "q_backfill" -> qBackfillSql,
    "q_cdc_merge" -> qCdcMergeSql,
    "q_cdc_scd2" -> qCdcScd2Sql,
    "q_quality_checks" -> qQualityChecksSql)
}
