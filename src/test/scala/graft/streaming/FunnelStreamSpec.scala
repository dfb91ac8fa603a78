package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{SparkSpec, Tables}
import graft.ops.EventAnalytics

/** Streaming funnel (C83): single-batch runs are exactly batch-equal;
  * cross-batch deepening emits a new, deeper row per user.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._
  import EventStreams._

  private def ev(id: Long, user: Long, typ: String, minute: Long) =
    Event(id, new java.sql.Timestamp(minute * 60000L), user, typ, 0.0)

  test("single-batch stream equals the batch funnel on real events") {
    val dir = Files.createTempDirectory("graft_funnel_src_").toString
    Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .write.mode("overwrite").parquet(dir)
    val gap = 24L * 3600 * 1000000L
    val q = funnelStream(eventStream(spark, dir).as[Event],
      Seq("view", "click", "purchase"), gap)
      .toDF("user_id", "n_steps", "ts_us")
      .writeStream.format("memory").queryName("funnel_live")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("funnel_live")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
      .toSet
    val batch = EventAnalytics.funnelSteps(
      Tables.load(spark, sfDir, "events"), "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), gap)
      .collect().map { r =>
        (r.getLong(0), r.getInt(1),
          (1 to r.getInt(1)).map(i => r.getLong(1 + i)))
      }.toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  // ------------- C94: streaming transition matrix (stateful twin)

  test("single-batch transition stream equals the batch matrix") {
    val dir = Files.createTempDirectory("graft_trans_src_").toString
    Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .write.mode("overwrite").parquet(dir)
    val q = transitionStream(eventStream(spark, dir).as[Event])
      .toDF("from_type", "to_type")
      .writeStream.format("memory").queryName("trans_live")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("trans_live")
      .groupBy("from_type", "to_type").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = EventAnalytics.transitionMatrix(
      Tables.load(spark, sfDir, "events"), "user_id", "event_type", "ts",
      "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("NULL user/ts rows are dropped at the typed boundary, batch-style") {
    // A parquet source with a NULL ts and a NULL user_id row: the batch
    // twin filters both before pairing; typedEvents must guard them
    // BEFORE Dataset encoding (user_id is a primitive — unguarded, the
    // encoder throws) and transitionStream re-guards ts itself.
    val dir = Files.createTempDirectory("graft_trans_null_").toString
    spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, new java.sql.Timestamp(0L), 5L, "view", 0.0),
        org.apache.spark.sql.Row(2L, null, 5L, "poison", 0.0),
        org.apache.spark.sql.Row(3L, new java.sql.Timestamp(60000L), null, "poison", 0.0),
        org.apache.spark.sql.Row(4L, new java.sql.Timestamp(120000L), 5L, "click", 0.0)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType))))
      .write.mode("overwrite").parquet(dir)
    val q = transitionStream(typedEvents(eventStream(spark, dir)))
      .toDF("from_type", "to_type")
      .writeStream.format("memory").queryName("trans_null")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val pairs = spark.table("trans_null")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pairs == Seq(("view", "click"))) // poison rows dropped, chain intact
  }

  test("transition state chains pairs across batches") {
    val input = MemoryStream[Event](spark)
    val q = transitionStream(input.toDS())
      .toDF("from_type", "to_type")
      .writeStream.format("memory").queryName("trans_2b")
      .outputMode("append").start()
    input.addData(ev(1, 9L, "view", 0), ev(2, 9L, "click", 1))
    q.processAllAvailable()
    input.addData(ev(3, 9L, "buy", 2)) // pairs against carried "click"
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("trans_2b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(pairs == Seq(("click", "buy"), ("view", "click")))
  }

  test("cross-batch events deepen the chain; deepest row wins") {
    val input = MemoryStream[Event](spark)
    val q = funnelStream(input.toDS(), Seq("view", "click"), Long.MaxValue)
      .toDF("user_id", "n_steps", "ts_us")
      .writeStream.format("memory").queryName("funnel_2b")
      .outputMode("append").start()
    input.addData(ev(1, 7L, "view", 0))        // batch 1: depth 1
    q.processAllAvailable()
    input.addData(ev(2, 7L, "click", 10))      // batch 2: deepens to 2
    input.addData(ev(3, 7L, "view", 5))        // ignored: chain anchored
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_2b")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
    assert(rows.toSet == Set(
      (7L, 1, Seq(0L)), (7L, 2, Seq(0L, 600000000L))))
  }
}
