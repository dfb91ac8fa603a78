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

  // ------------------------------------- A25: approx distinct (rows-only)
  // HLL sketches are engine-specific; the query returns approx + exact so
  // the spec can assert the error bound, and the driver rows-checks it.
  private def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup" -> qRollup _,
    "q_cube" -> qCube _,
    "q_percentiles" -> qPercentiles _,
    "q_set_ops" -> qSetOps _,
    "q_approx_distinct" -> qApproxDistinct _)

  override val oracleSql: Map[String, String] = Map(
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_percentiles" -> qPercentilesSql,
    "q_set_ops" -> qSetOpsSql)
    // q_approx_distinct: rows-only (sketch internals are engine-specific)
}
