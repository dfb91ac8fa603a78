package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.ops.TemporalJoins

/** Temporal join queries (SURVEY.md §2 C18/C19): as-of attribution and
  * windowed range counting over the events stream, both oracle-checked
  * (DuckDB ASOF JOIN / inequality join re-derive the semantics).
  */
object TemporalQueries extends QueryModule {

  // ------------------------------ C18: as-of join (click attribution)
  // For each purchase, the user's most recent click at or before it.
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    TemporalJoins.asOfJoinNative(purchases, clicks, "user_id", "ts", "event_id")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("matched_event_id"),
        unix_micros(col("matched_ts")).as("matched_ts_us"))
      .orderBy("event_id")
  }

  private val qAsofJoinSql =
    """WITH clicks0 AS (
      |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |clicks AS (
      |  SELECT user_id, ts, event_id FROM (
      |    SELECT user_id, ts, event_id,
      |      ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |    FROM clicks0) WHERE rn = 1),
      |purch AS (
      |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
      |  c.event_id AS matched_event_id, epoch_us(c.ts) AS matched_ts_us
      |FROM purch p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  // ------------------- C18b: as-of join with tolerance (bounded lookback)
  // Same attribution, but a click only counts within 1 hour of the
  // purchase (merge_asof `tolerance` semantics).
  private val AsofToleranceUs = 3600000000L

  private def qAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    TemporalJoins.asOfJoinTolerance(purchases, clicks,
        "user_id", "ts", "event_id", AsofToleranceUs)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("matched_event_id"),
        unix_micros(col("matched_ts")).as("matched_ts_us"))
      .orderBy("event_id")
  }

  private val qAsofToleranceSql =
    s"""WITH clicks0 AS (
       |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
       |clicks AS (
       |  SELECT user_id, ts, event_id FROM (
       |    SELECT user_id, ts, event_id,
       |      ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
       |    FROM clicks0) WHERE rn = 1),
       |purch AS (
       |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
       |matched AS (
       |  SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       |    c.event_id AS m_id, epoch_us(c.ts) AS m_us
       |  FROM purch p ASOF LEFT JOIN clicks c
       |    ON p.user_id = c.user_id AND p.ts >= c.ts)
       |SELECT event_id, user_id, ts_us,
       |  CASE WHEN m_us >= ts_us - $AsofToleranceUs THEN m_id END AS matched_event_id,
       |  CASE WHEN m_us >= ts_us - $AsofToleranceUs THEN m_us END AS matched_ts_us
       |FROM matched ORDER BY event_id""".stripMargin

  // ------------------------------ C19: bucketized range join
  // Clicks per user in the 10 minutes before each error event.
  private val LookbackUs = 600000000L

  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("click_us"))
    TemporalJoins.rangeJoinBucketed(errors, clicks,
        "user_id", "us", "click_us", LookbackUs)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("event_id")
  }

  private val qRangeJoinSql =
    s"""SELECT e.event_id, COUNT(*) AS n_clicks
       |FROM events e JOIN events c
       |  ON e.user_id = c.user_id
       |  AND e.event_type = 'error' AND c.event_type = 'click'
       |  AND epoch_us(c.ts) BETWEEN epoch_us(e.ts) - $LookbackUs AND epoch_us(e.ts)
       |GROUP BY e.event_id
       |ORDER BY e.event_id""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> qAsofJoin _,
    "q_asof_tolerance" -> qAsofTolerance _,
    "q_range_join" -> qRangeJoin _)

  override val oracleSql: Map[String, String] = Map(
    "q_asof_join" -> qAsofJoinSql,
    "q_asof_tolerance" -> qAsofToleranceSql,
    "q_range_join" -> qRangeJoinSql)
}
