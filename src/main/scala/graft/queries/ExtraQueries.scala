package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{ExactAgg => X, QueryModule, Tables}

/** Additional relational surface (SURVEY.md §2 A23–A25): multi-level
  * aggregation (ROLLUP/CUBE) and exact discrete percentiles, plus an
  * approximate-distinct operator benchmarked against its exact twin.
  */
object ExtraQueries extends QueryModule {

  // ------------------------------------------------- A23: ROLLUP
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), X.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val qRollupSql =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       |  ${X.sqlSum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------- A23b: CUBE
  private def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val qCubeSql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------- A35: date spine scaffolding
  // The dbt_utils.date_spine pattern: generate the full calendar range,
  // left join daily facts, zero-fill gaps — days with NO events must
  // appear (that is the point of a spine; events only span January).
  private def qDateSpine(s: SparkSession, dir: String): DataFrame = {
    val spine = graft.model.Macros.dateSpine(s, "2023-12-25", "2024-02-05", "d")
    val daily = Tables.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n_events"))
    spine.join(daily, Seq("d"), "left")
      .select(col("d"), coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("d")
  }

  private val qDateSpineSql =
    """WITH spine AS (
      |  SELECT CAST(g AS DATE) AS d
      |  FROM generate_series(DATE '2023-12-25', DATE '2024-02-05',
      |                       INTERVAL 1 DAY) AS t(g)),
      |daily AS (
      |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events
      |  FROM events GROUP BY 1)
      |SELECT s.d, COALESCE(n_events, 0) AS n_events
      |FROM spine s LEFT JOIN daily USING (d)
      |ORDER BY d""".stripMargin

  // ------------------------------------- A36: explicit GROUPING SETS
  // Arbitrary grouping-set combinations + GROUPING() markers (the
  // disambiguator between "NULL key value" and "aggregated-away key").
  private def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  COUNT(*) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  private val qGroupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio,
      |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------- A24: exact percentiles
  // percentile_disc picks actual data values (no interpolation): exact and
  // engine-portable, unlike interpolated percentiles whose float
  // arithmetic differs.
  private def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q25,
        |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS q50,
        |  percentile_disc(0.9)  WITHIN GROUP (ORDER BY l_quantity) AS q90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  private val qPercentilesSql =
    """SELECT l_returnflag,
      |  quantile_disc(l_quantity, 0.25) AS q25,
      |  quantile_disc(l_quantity, 0.5) AS q50,
      |  quantile_disc(l_quantity, 0.9) AS q90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------- A26: set operations
  // INTERSECT/EXCEPT between customers who placed F-status orders and
  // customers in the BUILDING segment.
  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val fCust = Tables.load(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    val bCust = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    fCust.intersect(bCust).withColumn("op", lit("both"))
      .unionByName(fCust.except(bCust).withColumn("op", lit("f_only")))
      .orderBy("op", "custkey")
  }

  private val qSetOpsSql =
    """WITH f_cust AS (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
      |b_cust AS (
      |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |SELECT custkey, op FROM (
      |  SELECT custkey, 'both' AS op FROM (SELECT custkey FROM f_cust INTERSECT SELECT custkey FROM b_cust)
      |  UNION ALL
      |  SELECT custkey, 'f_only' AS op FROM (SELECT custkey FROM f_cust EXCEPT SELECT custkey FROM b_cust))
      |ORDER BY op, custkey""".stripMargin

  // ------------------------------------------------- A32: bag set operations
  // EXCEPT ALL keeps multiplicity: lineitem suppkeys minus one occurrence
  // per matching orders-derived key.
  private def qSetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 200)
      .select(col("l_suppkey").as("k"))
    val b = Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 100)
      .select(col("l_suppkey").as("k"))
    a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("n")).orderBy("k")
  }

  private val qSetOpsAllSql =
    """SELECT k, COUNT(*) AS n FROM (
      |  SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 200
      |  EXCEPT ALL
      |  SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 100)
      |GROUP BY k ORDER BY k""".stripMargin

  // ------------------------------------------------- A33: null-safe equality
  // Join lag-derived nullable keys with <=> (IS NOT DISTINCT FROM):
  // null <=> null is TRUE, unlike plain equality.
  private def qNullSafe(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = Tables.load(s, dir, "events")
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
    // count transitions, treating the leading null as its own category
    ev.groupBy(col("event_type"), col("prev_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("prev_type").isNull <=> lit(true) ||
        col("prev_type") === col("event_type"))
      .orderBy(col("event_type"), col("prev_type").asc_nulls_first)
  }

  private val qNullSafeSql =
    """SELECT event_type, prev_type, COUNT(*) AS n FROM (
      |  SELECT event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events)
      |GROUP BY event_type, prev_type
      |HAVING (prev_type IS NULL) IS NOT DISTINCT FROM TRUE
      |    OR prev_type = event_type
      |ORDER BY event_type, prev_type ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------- A31: correlated subquery
  // Orders 1.5x above their own customer's exact average — exercises
  // Catalyst's subquery decorrelation (rewritten to an aggregate+join).
  private val correlatedSql =
    s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
       |WHERE o_totalprice > (
       |  SELECT 1.5 * ${X.sqlAvg("o2.o_totalprice")}
       |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
       |ORDER BY o_orderkey""".stripMargin

  private def qCorrelated(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(correlatedSql)
  }

  // ------------------------------------------------- A27: pivot
  // Orders count by year pivoted on status — Spark's relational pivot
  // operator; the oracle states the same contract as conditional aggs.
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_year")

  private val qPivotSql =
    """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS "F",
      |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS "O",
      |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS "P"
      |FROM orders GROUP BY o_year ORDER BY o_year""".stripMargin

  // --------------------------------------------------- A41: UNPIVOT
  // The inverse of A27's pivot: wide per-status counts melted back to
  // (year, status, n) rows via Dataset.unpivot (SQL `stack`) — long
  // form is what plotting/modeling layers want. Zero-count cells are
  // kept (they exist in the wide frame); unpivot is a pure ROW-LOCAL
  // projection+explode, no shuffle beyond the pivot that built the
  // wide input.
  private def qUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .unpivot(Array(col("o_year")), Array(col("F"), col("O"), col("P")),
        "status", "n")
      .orderBy("o_year", "status")

  private val qUnpivotSql =
    """WITH wide AS (
      |  SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
      |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS f,
      |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS o,
      |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS p
      |  FROM orders GROUP BY o_year)
      |SELECT o_year, status, n FROM wide
      |UNPIVOT (n FOR status IN (f AS 'F', o AS 'O', p AS 'P'))
      |ORDER BY o_year, status""".stripMargin

  // ------------------------------------------------- A28: window navigation
  private def qWindowNav(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        first(col("o_orderkey")).over(wFull).as("first_order"),
        last(col("o_orderkey")).over(wFull).as("last_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowNavSql =
    """SELECT o_custkey, o_orderkey,
      |  LAG(o_orderkey, 1) OVER w AS prev_order,
      |  LEAD(o_orderkey, 1) OVER w AS next_order,
      |  FIRST_VALUE(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
      |  LAST_VALUE(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
      |FROM orders WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // --------------------------------- A34: statistical window functions
  // percent_rank / cume_dist are exact rational values (rank arithmetic,
  // per-row IEEE division — engine-identical); ntile buckets are integer.
  private def qWindowStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(
        col("o_orderstatus"), col("o_orderkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).cast("int").as("quartile"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  private val qWindowStatsSql =
    """SELECT o_orderstatus, o_orderkey,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd,
      |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  // ------------------------------------------------- A29: string aggregation
  // Sorted concat makes collect_list order-independent (required both for
  // the oracle and for determinism under shuffles).
  private def qStringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n"))
      .orderBy("n_regionkey")

  private val qStringAggSql =
    """SELECT n_regionkey,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  COUNT(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  // ------------------------------------------------- A30: RANGE window frame
  // Exact 7-day trailing order count per customer (range frame over days).
  private def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_day"))
      .rangeBetween(-6, Window.currentRow)
    Tables.load(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .withColumn("o_day",
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")))
      .withColumn("orders_trailing_7d", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_day"),
        col("orders_trailing_7d"))
      .orderBy("o_custkey", "o_day", "o_orderkey")
  }

  private val qWindowRangeSql =
    """SELECT o_custkey, o_orderkey, o_day,
      |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_day
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS orders_trailing_7d
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS o_day
      |  FROM orders WHERE o_custkey < 50)
      |ORDER BY o_custkey, o_day, o_orderkey""".stripMargin

  // ----------------------------------------------- A25: approx distinct
  // HLL sketch VALUES are engine-specific (Spark's HLL++ vs any oracle's
  // HLL differ per group), so the raw approximation can never hash-match
  // a second engine. What IS cross-engine checkable — and what the
  // operator actually promises — is the error CONTRACT: the hash-exact
  // distinct count plus a boolean asserting the engine's own sketch
  // landed within the configured relative error (rsd 0.02, asserted at
  // 5% ≡ 2.5σ). Both engines compute their own sketch, check their own
  // bound, and agree on (exact, true) — a hash-green row that still
  // exercises the approximate path end-to-end. The spec additionally
  // pins the Spark-side approx value's bound directly.
  private def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        (abs(approx_count_distinct(col("l_partkey"), 0.02) -
            countDistinct(col("l_partkey"))) * 100 <=
          countDistinct(col("l_partkey")) * 5).as("within_bound"))
      .orderBy("l_returnflag")

  private val qApproxDistinctSql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  ABS(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
      |    * 100 <= COUNT(DISTINCT l_partkey) * 5 AS within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup" -> qRollup _,
    "q_date_spine" -> qDateSpine _,
    "q_grouping_sets" -> qGroupingSets _,
    "q_cube" -> qCube _,
    "q_percentiles" -> qPercentiles _,
    "q_set_ops" -> qSetOps _,
    "q_pivot" -> qPivot _,
    "q_unpivot" -> qUnpivot _,
    "q_window_nav" -> qWindowNav _,
    "q_window_stats" -> qWindowStats _,
    "q_string_agg" -> qStringAgg _,
    "q_window_range" -> qWindowRange _,
    "q_correlated" -> qCorrelated _,
    "q_set_ops_all" -> qSetOpsAll _,
    "q_null_safe" -> qNullSafe _,
    "q_approx_distinct" -> qApproxDistinct _)

  override val oracleSql: Map[String, String] = Map(
    "q_rollup" -> qRollupSql,
    "q_date_spine" -> qDateSpineSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_cube" -> qCubeSql,
    "q_percentiles" -> qPercentilesSql,
    "q_set_ops" -> qSetOpsSql,
    "q_pivot" -> qPivotSql,
    "q_unpivot" -> qUnpivotSql,
    "q_window_nav" -> qWindowNavSql,
    "q_window_stats" -> qWindowStatsSql,
    "q_string_agg" -> qStringAggSql,
    "q_window_range" -> qWindowRangeSql,
    "q_correlated" -> correlatedSql,
    "q_set_ops_all" -> qSetOpsAllSql,
    "q_null_safe" -> qNullSafeSql,
    "q_approx_distinct" -> qApproxDistinctSql)
}
