package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{ExactAgg => X, QueryModule, Tables}

/** Core relational surface (SURVEY.md §2 A1–A22): the SQL-model shapes the
  * reference executes through its warehouse (scan/filter/agg/join/window/
  * set ops), re-expressed as declarative DataFrame plans so Catalyst keeps
  * predicate pushdown, column pruning, and join strategy selection.
  *
  * Scale posture: dimension joins use explicit broadcast() (region/nation/
  * supplier/part stay small relative to facts at any SF); fact-fact joins
  * shuffle on their keys; every float reduction is an exact scaled-integer
  * sum (ExactAgg) which is also partition-order independent — required for
  * determinism on a 1000-executor cluster, not just for the oracle.
  */
object CoreQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // Net price per row: IEEE per-row arithmetic, identical on both engines.
  private def netPrice: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ---------------------------------------------------------------- A2: Q1
  private def qAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        X.dsum(col("l_quantity")).as("sum_qty"),
        X.dsum(col("l_extendedprice")).as("sum_base_price"),
        X.dsum(netPrice).as("sum_disc_price"),
        X.davg(col("l_quantity")).as("avg_qty"),
        X.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val qAggSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${X.sqlSum("l_quantity")} AS sum_qty,
       |  ${X.sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${X.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${X.sqlAvg("l_quantity")} AS avg_qty,
       |  ${X.sqlAvg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------- A1: filter + projection
  private def qFilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_quantity") < 10.0)
      .select(col("l_orderkey"), col("l_linenumber"),
        netPrice.as("net_price"))
      .orderBy("l_orderkey", "l_linenumber")

  private val qFilterProjectSql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0 - l_discount) AS net_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' AND l_quantity < 10.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ------------------------------------------- A3: conditional aggregation
  private def qConditionalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("cnt_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("cnt_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("cnt_p"),
        X.dsum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0)))
          .as("rev_f"))
      .orderBy("o_year")

  private val qConditionalAggSql =
    s"""SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_o,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_p,
       |  ${X.sqlSum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS rev_f
       |FROM orders
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin

  // ------------------------------------------- A4: distinct counting
  private def qDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      countDistinct(col("l_partkey")).as("distinct_parts"),
      countDistinct(col("l_suppkey")).as("distinct_supps"),
      countDistinct(col("l_returnflag"), col("l_linestatus")).as("distinct_flag_status"))

  private val qDistinctSql =
    """SELECT COUNT(DISTINCT l_partkey) AS distinct_parts,
      |  COUNT(DISTINCT l_suppkey) AS distinct_supps,
      |  COUNT(DISTINCT (l_returnflag, l_linestatus)) AS distinct_flag_status
      |FROM lineitem""".stripMargin

  // ------------------------------------------- A5: shuffle join + agg (Q3)
  private def qJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    // customer is the small side after the segment filter: broadcast it so
    // the orders/lineitem fact join is the only shuffle.
    o.join(broadcast(c), col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(X.dsum(netPrice).as("revenue"))
      .orderBy("l_orderkey")
  }

  private val qJoinAggSql =
    s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       |  ${X.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY l_orderkey, order_date
       |ORDER BY l_orderkey""".stripMargin

  // ------------------------------------------- A6: multi-way broadcast (Q5)
  private def qMultiJoin(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val sup = t(s, dir, "supplier")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    // Dim chain region->nation->supplier broadcast into the fact join:
    // only the orders<->lineitem shuffle survives at scale.
    val dims = sup
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    l.join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(X.dsum(netPrice).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  private val qMultiJoinSql =
    s"""SELECT n_name,
       |  ${X.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  // ------------------------------------------- A7: left join + nulls
  private def qLeftJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("order_count"),
        coalesce(X.dsum(col("o_totalprice")), lit(0.0)).cast("double").as("total_spent"))
      .orderBy("c_custkey")

  private val qLeftJoinSql =
    s"""SELECT c_custkey, c_name,
       |  COUNT(o_orderkey) AS order_count,
       |  CAST(COALESCE(${X.sqlSum("o_totalprice")}, 0.0) AS DOUBLE) AS total_spent
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey, c_name
       |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------- A8: semi join
  private def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey"))
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  private val qSemiJoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------- A9: anti join
  private def qAntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  private val qAntiJoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------- A10: keyed dedupe-keep-latest
  // The reference's silver_clean macro: QUALIFY ROW_NUMBER() OVER
  // (PARTITION BY key ORDER BY ts DESC) = 1 (macros.py:138-161).
  private def qWindowDedupe(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  private val qWindowDedupeSql =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------- A11: rank + running sum
  private def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .withColumn("rnk", rank().over(w))
      .withColumn("running_spend",
        (sum(floor(col("o_totalprice") * lit(1e6)).cast("long")).over(wRows)
          .cast("double") / lit(1e6)).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"), col("running_spend"))
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  private val qWindowRunningSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rnk,
      |  CAST(CAST(CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0) AS BIGINT)) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE) / 1000000.0 AS DOUBLE)
      |    AS running_spend
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin

  // ------------------------------------------- A12: top-k
  private def qTopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  private val qTopKSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ------------------------------------------- A13: having
  private def qHaving(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 30)
      .orderBy("l_partkey")

  private val qHavingSql =
    """SELECT l_partkey, COUNT(*) AS cnt FROM lineitem
      |GROUP BY l_partkey HAVING COUNT(*) > 30
      |ORDER BY l_partkey""".stripMargin

  // ------------------------------------------- A14: union
  private def qUnion(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    val b = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    a.union(b).distinct().orderBy("custkey")
  }

  private val qUnionSql =
    """SELECT DISTINCT custkey FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |  UNION ALL
      |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |ORDER BY custkey""".stripMargin

  // ------------------------------------------- A15: scalar subquery
  // The identical SQL text (exact scaled-integer average twin) runs on
  // both engines; Spark plans a genuine Catalyst ScalarSubquery —
  // executed once, its result broadcast into the filter — which
  // PlanShapeSpec pins. (Earlier rounds computed the threshold with a
  // driver-side .head(); correct but never exercised subquery planning.)
  private val qScalarSubquerySql =
    s"""SELECT o_orderkey, o_totalprice FROM orders
       |WHERE o_totalprice > (SELECT ${X.sqlAvg("o_totalprice")} * 2.0 FROM orders)
       |ORDER BY o_orderkey""".stripMargin

  private def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(qScalarSubquerySql)
  }

  // ------------------------------------------- A16: CTE pipeline
  private def qCte(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    t(s, dir, "customer")
      .join(perCust, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("cnt")).as("orders_total"), count(lit(1)).as("customers"))
      .orderBy("c_mktsegment")
  }

  private val qCteSql =
    """WITH per_cust AS (
      |  SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey)
      |SELECT c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS orders_total,
      |  COUNT(*) AS customers
      |FROM customer JOIN per_cust ON c_custkey = o_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------- A17: string functions
  private def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").like("%widget%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        concat(col("p_type"), lit("#"), col("p_brand")).as("type_brand"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
      .orderBy("p_partkey")

  private val qStringFuncsSql =
    """SELECT p_partkey,
      |  UPPER(p_brand) AS brand_u,
      |  SUBSTRING(p_name, 1, 8) AS name8,
      |  CONCAT(p_type, '#', p_brand) AS type_brand,
      |  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
      |  REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled
      |FROM part WHERE p_name LIKE '%widget%'
      |ORDER BY p_partkey""".stripMargin

  // ------------------------------------------- A18: date functions
  private def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .as("days_since_epoch0"))
      .orderBy("o_orderkey")

  private val qDateFuncsSql =
    """SELECT o_orderkey,
      |  CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(MONTH(o_orderdate) AS INTEGER) AS o_month,
      |  CAST(DAY(o_orderdate) AS INTEGER) AS o_day,
      |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
      |  CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch0
      |FROM orders WHERE o_orderkey < 500
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------- A19: JSON extraction
  private def qJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") >= 50)
      .orderBy("event_id")

  private val qJsonSql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------- A20: exact variance/stddev
  private def qStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        X.dsum(col("value")).as("sum_value"),
        X.davg(col("value")).as("avg_value"),
        X.dvarSamp(col("value")).as("var_value"))
      .orderBy("event_type")

  private val qStatsSql =
    s"""SELECT event_type, COUNT(*) AS n,
       |  ${X.sqlSum("value")} AS sum_value,
       |  ${X.sqlAvg("value")} AS avg_value,
       |  ${X.sqlVarSamp("value")} AS var_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------- A21: gap sessionization
  // 30-minute inactivity gap. All arithmetic on exact microsecond longs.
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_num", sum(col("new_sess")).over(cum))
      .groupBy(col("user_id"), col("session_num"))
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("session_start_us"))
      .orderBy("user_id", "session_num")
  }

  private val qSessionizeSql =
    """WITH ordered AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM ordered),
      |sessions AS (
      |  SELECT user_id, us,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_num
      |  FROM flagged)
      |SELECT user_id, session_num, COUNT(*) AS n_events, MIN(us) AS session_start_us
      |FROM sessions GROUP BY user_id, session_num
      |ORDER BY user_id, session_num""".stripMargin

  // ------------------------------------------- A22: tumbling window agg
  // Batch twin of the Structured Streaming windowed aggregation
  // (streaming/EventStreams.scala); uses the same window() operator.
  private def qStreamWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), X.dsum(col("value")).as("total_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start_us", "event_type")

  private val qStreamWindowSql =
    s"""SELECT epoch_us(DATE_TRUNC('hour', ts)) AS window_start_us, event_type,
       |  COUNT(*) AS n, ${X.sqlSum("value")} AS total_value
       |FROM events
       |GROUP BY window_start_us, event_type
       |ORDER BY window_start_us, event_type""".stripMargin

  // ----------------------------------------------------------------------
  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg" -> qAgg _,
    "q_filter_project" -> qFilterProject _,
    "q_conditional_agg" -> qConditionalAgg _,
    "q_distinct" -> qDistinct _,
    "q_join_agg" -> qJoinAgg _,
    "q_multi_join" -> qMultiJoin _,
    "q_left_join" -> qLeftJoin _,
    "q_semi_join" -> qSemiJoin _,
    "q_anti_join" -> qAntiJoin _,
    "q_window_dedupe" -> qWindowDedupe _,
    "q_window_running" -> qWindowRunning _,
    "q_topk" -> qTopK _,
    "q_having" -> qHaving _,
    "q_union" -> qUnion _,
    "q_scalar_subquery" -> qScalarSubquery _,
    "q_cte" -> qCte _,
    "q_string_funcs" -> qStringFuncs _,
    "q_date_funcs" -> qDateFuncs _,
    "q_json" -> qJson _,
    "q_stats" -> qStats _,
    "q_sessionize" -> qSessionize _,
    "q_stream_window" -> qStreamWindow _)

  override val oracleSql: Map[String, String] = Map(
    "q_agg" -> qAggSql,
    "q_filter_project" -> qFilterProjectSql,
    "q_conditional_agg" -> qConditionalAggSql,
    "q_distinct" -> qDistinctSql,
    "q_join_agg" -> qJoinAggSql,
    "q_multi_join" -> qMultiJoinSql,
    "q_left_join" -> qLeftJoinSql,
    "q_semi_join" -> qSemiJoinSql,
    "q_anti_join" -> qAntiJoinSql,
    "q_window_dedupe" -> qWindowDedupeSql,
    "q_window_running" -> qWindowRunningSql,
    "q_topk" -> qTopKSql,
    "q_having" -> qHavingSql,
    "q_union" -> qUnionSql,
    "q_scalar_subquery" -> qScalarSubquerySql,
    "q_cte" -> qCteSql,
    "q_string_funcs" -> qStringFuncsSql,
    "q_date_funcs" -> qDateFuncsSql,
    "q_json" -> qJsonSql,
    "q_stats" -> qStatsSql,
    "q_sessionize" -> qSessionizeSql,
    "q_stream_window" -> qStreamWindowSql)
}
