package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream product analytics over the `events` table: ordered
  * funnel conversion and cohort retention — the two queries every
  * warehouse team rebuilds on day one (the reference's SQL-model layer
  * is routinely used for exactly these; cf. macros.py's gold_aggregate
  * stage). Both are expressed as keyed aggregates and equi-joins so
  * they hold their shape on an unbounded event log.
  */
object EventAnalytics {

  /** Ordered windowed funnel: for each user, the earliest time each
    * step of `steps` was reached, where step i+1 must occur STRICTLY
    * AFTER the user's step-i time (a purchase logged before the first
    * view does not convert that view) and, when `maxGapMicros` is
    * finite, within that many microseconds of it — the "convert within
    * 24 h" form every product funnel uses. Emits one row per user who
    * reached step 1, with `n_steps` (how deep they got) and the step
    * timestamps as exact epoch microseconds (`t1..tk`, NULL beyond
    * `n_steps`).
    *
    * Scale shape: one aggregate per step, all hash-keyed on the user
    * column — the same exchange every round (co-partitioned, AQE
    * reuses it); candidate events for step i+1 are filtered by a
    * per-user equi-join against the step-i times (never event×event).
    * k is the funnel length — small by construction. NULL users/
    * timestamps carry no evidence.
    *
    * Output: userCol, n_steps, t1..tk (long micros). */
  def funnelSteps(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], maxGapMicros: Long = Long.MaxValue): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapMicros > 0, "maxGapMicros must be positive")
    val ev = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), col(typeCol).as("__t"),
        unix_micros(col(tsCol)).as("__us"))
    var reached = ev.filter(col("__t") === steps.head)
      .groupBy(col(userCol)).agg(min(col("__us")).as("t1"))
    for (i <- 2 to steps.length) {
      val prev = s"t${i - 1}"
      val inWindow =
        if (maxGapMicros == Long.MaxValue) lit(true) // unbounded: no +gap (overflow)
        else col("__us") <= col("__prev") + maxGapMicros
      val next = ev.filter(col("__t") === steps(i - 1))
        .join(reached.select(col(userCol), col(prev).as("__prev")),
          Seq(userCol))
        .filter(col("__us") > col("__prev") && inWindow)
        .groupBy(col(userCol)).agg(min(col("__us")).as(s"t$i"))
      reached = reached.join(next.select(col(userCol), col(s"t$i")),
        Seq(userCol), "left")
    }
    // fold 1..k so the LAST-wrapped (outermost) branch tests the
    // deepest step: when(t_k, k) else … else when(t1, 1)
    val depth = (1 to steps.length).foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t$i").isNotNull, lit(i)).otherwise(acc)
    }
    reached.select(col(userCol) +: depth.as("n_steps") +:
      (1 to steps.length).map(i => col(s"t$i")): _*)
  }

  private val WeekMicros = 7L * 24 * 3600 * 1000000L

  /** Cohort retention matrix: users bucketed by the epoch-week of their
    * FIRST event (the cohort), counted once per (cohort, week-offset)
    * they were active in. The output is the classic retention triangle
    * — n_users at offset 0 is the cohort size.
    *
    * Weeks are exact integral epoch-microsecond buckets
    * (`unix_micros div 604800000000`), not calendar weeks — engine- and
    * locale-independent, and the bucket arithmetic is pure integer.
    *
    * Scale shape: one (user, week) distinct, one user-keyed min for
    * cohorts, one broadcast-size join back, one (cohort, offset)
    * count — every exchange keyed, none corpus-wide. NULL users/
    * timestamps carry no evidence.
    *
    * Output: cohort_week (long), week_offset (long), n_users (long). */
  def retentionMatrix(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val active = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol),
        expr(s"unix_micros($tsCol) div ${WeekMicros}L").as("wk"))
      .distinct()
    val cohort = active.groupBy(col(userCol))
      .agg(min(col("wk")).as("cohort_week"))
    active.join(cohort, Seq(userCol))
      .groupBy(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Event-transition matrix: for each user's event stream in time
    * order, count (from_type → to_type) adjacencies — the first-order
    * Markov view of product behavior (what users do NEXT after a
    * view/click/error), the input to flow diagrams and
    * next-action-prediction baselines.
    *
    *   Ordering is total and engine-exact: (ts, tiebreakCol) — two
    * events in the same microsecond order by the tiebreaker (an event
    * id), so the lag pairing can never depend on partitioning. Each
    * user's FIRST event has no predecessor and feeds no pair.
    *
    * Scale shape: ONE user-partitioned ordered window (lag) + one
    * (from, to)-keyed count with map-side partials — work per user is
    * their event count (the per-user window is the honest shape here:
    * a user's stream must be ordered to be paired; hot users are
    * bounded by their own history, not the corpus). NULL users/
    * timestamps carry no evidence.
    *
    * Output: from_type, to_type, n_transitions. */
  def transitionMatrix(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      tiebreakCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }
}
