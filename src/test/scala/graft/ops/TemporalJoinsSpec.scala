package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at or before each left row") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),  // after both clicks
      (1L, 101L, ts("2024-01-01 08:30:00")),  // between clicks
      (1L, 102L, ts("2024-01-01 07:00:00")),  // before any click
      (2L, 103L, ts("2024-01-01 10:00:00")))  // user with no clicks
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 10L, ts("2024-01-01 08:00:00")),
      (1L, 11L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "ts")
    val out = TemporalJoins.asOfJoin(left, right, "user_id", "ts", "event_id")
      .select($"event_id", $"matched_event_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L).contains(11L))
    assert(out(101L).contains(10L))
    assert(out(102L).isEmpty)
    assert(out(103L).isEmpty)
  }

  test("asOfJoin matches at exactly equal timestamps and breaks ties deterministically") {
    val t0 = ts("2024-01-01 08:00:00")
    val left = Seq((1L, 100L, t0)).toDF("user_id", "event_id", "ts")
    val right = Seq((1L, 10L, t0), (1L, 11L, t0)) // tie at same ts
      .toDF("user_id", "event_id", "ts")
    val out = TemporalJoins.asOfJoin(left, right, "user_id", "ts", "event_id")
      .select($"matched_event_id").head()
    assert(out.getLong(0) == 11L) // highest id survives the (key, ts) dedupe
  }

  test("native as-of join matches the composed formulation on real data") {
    val ev = Tables.load(spark, sfDir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts", $"value")

    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"matched_event_id", $"matched_ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet

    val composed = key(TemporalJoins.asOfJoin(
      purchases, clicks, "user_id", "ts", "event_id"))
    val native = key(TemporalJoins.asOfJoinNative(
      purchases, clicks, "user_id", "ts", "event_id"))
    assert(native == composed)
    assert(native.nonEmpty)

    // physical plan is the custom operator: no union, single merge node
    val plan = TemporalJoins.asOfJoinNative(
      purchases, clicks, "user_id", "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Union"))
    assert(!plan.contains("Window"))
  }

  test("native as-of join: interpreted fallback equals the codegen path") {
    val ev = Tables.load(spark, sfDir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    def run() = TemporalJoins.asOfJoinNative(
      purchases, clicks, "user_id", "ts", "event_id")
      .select($"event_id", $"matched_event_id", $"matched_ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = run()
      assert(interpreted == withCodegen)
      assert(interpreted.nonEmpty)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("native as-of join handles ties, equal timestamps, and null keys") {
    val t0 = ts("2024-01-01 08:00:00")
    val left = Seq(
      (Some(1L), 100L, t0),
      (None, 101L, t0)) // null key: never matches
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (Some(1L), 10L, t0), (Some(1L), 11L, t0), // tie at same ts
      (None, 12L, t0))
      .toDF("user_id", "event_id", "ts")
    val out = TemporalJoins.asOfJoinNative(left, right, "user_id", "ts", "event_id")
      .select($"event_id", $"matched_event_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L).contains(11L)) // highest id wins the tie
    assert(out(101L).isEmpty)
  }

  test("native as-of join edge cases: empty right side, tolerance cutoff") {
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_id", "ts")
    val emptyRight = Seq.empty[(Long, Long, java.sql.Timestamp)]
      .toDF("user_id", "event_id", "ts")
    val out = TemporalJoins.asOfJoinNative(left, emptyRight, "user_id", "ts", "event_id")
      .select($"event_id", $"matched_event_id").collect()
    assert(out.length == 1 && out.head.isNullAt(1)) // LEFT semantics survive

    // tolerance: click 2h before purchase nulls out under a 1h window
    val right = Seq((1L, 10L, ts("2024-01-01 08:00:00")))
      .toDF("user_id", "event_id", "ts")
    val within = TemporalJoins.asOfJoinTolerance(left, right,
      "user_id", "ts", "event_id", toleranceUs = 3600L * 1000000L)
      .select($"matched_event_id").head()
    assert(within.isNullAt(0))
    val wide = TemporalJoins.asOfJoinTolerance(left, right,
      "user_id", "ts", "event_id", toleranceUs = 3L * 3600L * 1000000L)
      .select($"matched_event_id").head()
    assert(wide.getLong(0) == 10L)
  }

  test("bucketized range join equals the naive non-equi join") {
    val ev = Tables.load(spark, sfDir, "events")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), unix_micros($"ts").as("click_us"))
    val lookback = 3600L * 1000000L // 1 hour for more pairs at tiny SF

    val naive = errors.join(clicks,
        $"user_id" === $"cu" &&
        $"click_us" >= $"us" - lookback && $"click_us" <= $"us")
      .select($"event_id", $"click_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val bucketed = TemporalJoins.rangeJoinBucketed(
        errors, clicks.withColumnRenamed("cu", "user_id"),
        "user_id", "us", "click_us", lookback)
      .select($"event_id", $"click_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
  }
}
