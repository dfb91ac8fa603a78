package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.{ExactAgg => X}
import graft.model.{Materializer, ModelConfig, Warehouse}

/** Structured Streaming surface: the streaming twins of the batch
  * operators (SURVEY.md §2 C12).
  *
  * The reference framework is batch-scheduled (its watcher re-runs models
  * on file change); on Spark the native continuous formulation is
  * readStream → event-time watermark → windowed aggregate /
  * flatMapGroupsWithState, with `foreachBatch` bridging micro-batches
  * into the same Materializer used by batch models — one merge
  * implementation for both arrival modes.
  *
  * == State-partition contract ==
  * Stateful operators here inherit `spark.sql.shuffle.partitions` as
  * their state partition count, and that number is FROZEN into the
  * checkpoint at first start. The bench harness pins its single-batch
  * driver runs to 8 (`ScaleQueries.DefaultStatePartitions`, swept at
  * sf0.1 and re-confirmed at 30× — warm steady state at 8 beats 32
  * because per-partition state-store instantiation plus task
  * scheduling dominate micro-batches at bench scale); that is BENCH
  * TUNING, not an operator default. A production caller sizes it
  * before the first start as
  * `state keys × bytes/key ÷ target state-per-task` (typical target
  * 100–500 MB/task so store load/snapshot stays off the critical
  * path), i.e. the 100 TB posture is MORE partitions, not fewer —
  * these operators' per-key state is constant-size by contract
  * (sketch cells, per-user session accumulators, seen-key sets), so
  * state volume scales with keys and shards cleanly by key hash.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  /** Epoch microseconds of a Timestamp, matching unix_micros()/epoch_us
    * exactly: getTime is millis with getNanos the POSITIVE sub-second
    * part, so the millis must FLOOR-divide to seconds (truncation would
    * shift pre-1970 instants by +1s before the nanos add back). The one
    * helper every stateful operator here shares. */
  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** NULL-guarded typed view of an event frame — the conversion point
    * every stateful operator here should enter through. The batch twins
    * (EventAnalytics.transitionMatrix, the funnel) drop NULL user/ts
    * rows before pairing; the typed path must apply that guard BEFORE
    * `.as[Event]`, because Event.user_id is a primitive Long and a
    * NULL-bearing row throws in the encoder, not in the operator. */
  def typedEvents(df: DataFrame): Dataset[Event] = {
    import df.sparkSession.implicits._
    df.filter(org.apache.spark.sql.functions.col("user_id").isNotNull &&
        org.apache.spark.sql.functions.col("ts").isNotNull)
      .as[Event]
  }

  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Int)

  /** File-based event stream over a parquet directory (the lake-ingest
    * shape: new files land, Spark discovers them incrementally). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Tumbling-window counts with a 10-minute watermark: late events past
    * the watermark are dropped, state is bounded — the streaming twin of
    * CoreQueries.q_stream_window (identical output columns). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), X.dsum(col("value")).as("total_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))

  /** Stream-static enrichment + windowed aggregate: each event joins a
    * slowly-changing dimension and the watermarked tumbling aggregate
    * groups by the ENRICHED attribute — the most common production
    * streaming shape (fact stream × dim table). The static side is
    * re-planned every micro-batch (dim updates between batches are
    * picked up) and joined BROADCAST, so the stream side sees no
    * shuffle before the aggregate's own state-store exchange. LEFT
    * join: events with no dim row aggregate under a NULL attribute
    * instead of vanishing (a dropped-row enrichment is a silent data
    * loss at 100 TB/day). */
  def enrichedWindowedCounts(events: DataFrame, dim: DataFrame,
      keyCol: String, attrCol: String): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .join(broadcast(dim.select(col(keyCol).as("__k"), col(attrCol))),
        col("user_id") === col("__k"), "left")
      .groupBy(window(col("ts"), "1 hour").as("w"), col(attrCol))
      .agg(count(lit(1)).as("n"), X.dsum(col("value")).as("total_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col(attrCol), col("n"), col("total_value"))

  /** Gap-based sessionizer over flatMapGroupsWithState: sessions close
    * when 30 minutes pass without an event for the user. Sessions that
    * close inside a batch are emitted immediately; the open session stays
    * in (bounded, per-user O(1)) state. The batch twin is
    * CoreQueries.q_sessionize. */
  def sessionize(events: Dataset[Event],
      gapMinutes: Long = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def update(userId: Long, evs: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var out = List.empty[Session]
      var st = state.getOption.orNull
      sorted.foreach { e =>
        val us = micros(e.ts)
        st match {
          case null => st = SessionState(us, us, 1)
          case s if us - s.last > gapUs =>
            out ::= Session(userId, s.start, s.last, s.n)
            st = SessionState(us, us, 1)
          case s => st = SessionState(s.start, us, s.n + 1)
        }
      }
      if (st != null) state.update(st)
      out.reverseIterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Stream-stream attribution join: each purchase matches the clicks of
    * the same user within the preceding `lookbackMinutes`. Both sides
    * carry watermarks and the join condition bounds the click timestamp
    * to a closed interval behind the purchase, so Spark can size the
    * join state and expire rows — the only stream-stream-join shape that
    * survives unbounded streams (an unconstrained condition would buffer
    * both streams forever). Inner join: late/unmatched rows simply drop.
    * Output: purchase_id, user_id, purchase_ts, click_id, click_ts. */
  def attributionJoin(
      purchases: DataFrame, clicks: DataFrame,
      lookbackMinutes: Long = 60): DataFrame = {
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    p.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $lookbackMinutes MINUTES"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Streaming exact dedup: drop events already seen within the
    * watermark horizon, keyed by content identity — the streaming twin of
    * Dedup.exact. State is bounded by the watermark (old keys age out),
    * which is the only formulation that survives an unbounded stream. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicates(keyCols :+ "ts")

  /** Streaming ordered windowed funnel — the live twin of
    * [[graft.ops.EventAnalytics.funnelSteps]]: per-user state is the
    * earliest step-time CHAIN (≤ k longs — O(1) per user, the bounded-
    * state discipline); each micro-batch's events process in
    * (ts, event_id) order and extend the chain greedily (step i+1
    * strictly after step i, within `maxGapMicros`). A user emits a row
    * whenever their chain deepens, so the deepest row per user is the
    * current funnel position.
    *
    * Exactness contract: greedy in-order processing equals the batch
    * funnel under in-order arrival (single-batch AvailableNow runs are
    * exactly batch-equal — each batch is sorted internally); an event
    * arriving across batches EARLIER than the established chain does
    * not retroactively re-anchor it (first-touch semantics — the
    * standard streaming-funnel tradeoff; re-anchoring would need
    * unbounded per-user event retention). Production adds an
    * event-time timeout to expire stale chains; these bounded driver
    * runs keep NoTimeout.
    *
    * Output: user_id, n_steps, ts_us (earliest chain times, length
    * n_steps). */
  def funnelStream(events: Dataset[Event], steps: Seq[String],
      maxGapMicros: Long = Long.MaxValue): Dataset[(Long, Int, Seq[Long])] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")

    def update(userId: Long, evs: Iterator[Event],
        state: GroupState[Seq[Long]]): Iterator[(Long, Int, Seq[Long])] = {
      var chain = state.getOption.getOrElse(Seq.empty)
      val before = chain
      evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val us = micros(e.ts)
        if (chain.isEmpty) {
          if (e.event_type == steps.head) chain = Seq(us)
        } else if (chain.size < steps.size &&
            e.event_type == steps(chain.size) && us > chain.last &&
            (maxGapMicros == Long.MaxValue ||
              us <= chain.last + maxGapMicros)) {
          chain = chain :+ us
        }
      }
      if (chain.nonEmpty) state.update(chain)
      if (chain.nonEmpty && chain != before)
        Iterator((userId, chain.size, chain))
      else Iterator.empty
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming twin of [[graft.ops.EventAnalytics.transitionMatrix]]:
    * per-user (from_type → to_type) adjacency pairs as events arrive,
    * with one tiny state cell per user (the LAST seen event's
    * (micros, event_id, type) — constant bytes, key-cardinality state,
    * never event retention). Within a batch events sort by
    * (micros, event_id) — the batch operator's exact total order — and
    * the carried last event chains pairs across batches.
    *
    * Exactness contract: a single-batch AvailableNow run is exactly
    * batch-equal (the batch sorts internally), as is any multi-batch
    * in-order arrival; an event arriving across batches EARLIER than
    * one already consumed pairs in ARRIVAL order (first-touch — the
    * funnelStream tradeoff; retro re-pairing would need unbounded
    * per-user retention). Downstream counts aggregate the emitted
    * pairs.
    *
    * NULL policy — the batch twin's: transitionMatrix drops NULL
    * user/ts rows before pairing, so the stream does too. NULL ts is
    * filtered HERE (it would otherwise NPE in micros); NULL user_id
    * cannot reach this operator at all — Event.user_id is a primitive,
    * so a NULL-bearing row throws in the ENCODER at `.as[Event]` —
    * which is why the conversion belongs to [[typedEvents]], where the
    * guard runs before encoding.
    *
    * Output rows: (from_type, to_type) — one per adjacency. */
  def transitionStream(
      events: Dataset[Event]): Dataset[(String, String)] = {
    import events.sparkSession.implicits._
    def update(userId: Long, evs: Iterator[Event],
        state: GroupState[(Long, Long, String)]): Iterator[(String, String)] = {
      var last = state.getOption
      val out = Seq.newBuilder[(String, String)]
      evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        last.foreach { case (_, _, t) => out += ((t, e.event_type)) }
        last = Some((micros(e.ts), e.event_id, e.event_type))
      }
      last.foreach(state.update)
      out.result().iterator
    }
    events.filter(_.ts != null).groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Bridge a CDC change stream into the batch Materializer: every
    * micro-batch applies one distributed merge — the streaming path and
    * the batch path share the exact same merge semantics. */
  def cdcStream(
      changes: DataFrame,
      wh: Warehouse,
      cfg: ModelConfig,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val mat = new Materializer(wh)
    changes.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mat.materialize(cfg, batch,
          batchTs = java.time.Instant.ofEpochSecond(batchId).toString)
        ()
      }
      .start()
  }
}
