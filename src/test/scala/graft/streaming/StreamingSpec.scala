package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{SparkSpec, Tables}
import graft.model.{ModelConfig, StateStore, Warehouse}
import scala.jdk.CollectionConverters._

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import EventStreams._

  /** Stage the events table as a streaming source directory. */
  private def stageEvents(): String = {
    val dir = Files.createTempDirectory("graft_stream_src_").toString
    Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming windowed counts equal the batch twin") {
    val src = stageEvents()
    val out = windowedCounts(eventStream(spark, src))
    val q = out.writeStream
      .format("memory").queryName("win_counts")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // Append mode only emits windows the watermark has passed; the last
    // hour stays open. Compare against the batch result minus open windows.
    val streamed = spark.table("win_counts")
      .select("window_start_us", "event_type", "n", "total_value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = graft.queries.CoreQueries.queries("q_stream_window")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed.subsetOf(batch), "streamed windows must match batch values")
    // everything except possibly the final open hour per type must be emitted
    val openCutoff = batch.map(_._1).max
    val closed = batch.filter(_._1 < openCutoff)
    assert(closed.subsetOf(streamed),
      s"closed windows missing: ${(closed -- streamed).take(3)}")
  }

  test("streaming count-min: cross-batch accumulation equals the batch sketch") {
    import graft.ops.Sketches
    // Two separate files -> two micro-batches (maxFilesPerTrigger=1):
    // the Complete-mode cell table must accumulate across batches to
    // exactly the batch sketch over the union.
    val part1 = Seq((1L, "alpha beta alpha"), (2L, "beta gamma")).toDF("id", "text")
    val part2 = Seq((3L, "alpha delta"), (4L, "beta beta epsilon")).toDF("id", "text")
    val flat = Files.createTempDirectory("graft_cm_flat_").toString
    part1.coalesce(1).write.mode("append").parquet(flat)
    part2.coalesce(1).write.mode("append").parquet(flat)

    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(col("text"), " ")).as("tok"))
    val d = 3; val w = 64
    val stream = spark.readStream.schema(part1.schema)
      .option("maxFilesPerTrigger", 1).parquet(flat)
    val cells = Sketches.countMinBuild(toks(stream), "tok", d, w).cells
    val q = cells.writeStream.format("memory").queryName("cm_cells")
      .outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_cm_ckpt_").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.recentProgress.length >= 2,
      "maxFilesPerTrigger=1 over 2 files must run >= 2 micro-batches")

    val streamed = spark.table("cm_cells").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketches.countMinBuild(
      toks(part1.unionByName(part2)), "tok", d, w).cells.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)

    // Probes through the shared estimate path agree with true counts
    // (no collisions at this tiny cardinality is not guaranteed, so
    // compare stream-vs-batch estimates, not truth).
    val probes = Seq("alpha", "beta", "zz_absent").toDF("tok")
    val se = Sketches.countMinEstimate(
      Sketches.CMSketch(spark.table("cm_cells"), d, w), probes, "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val be = Sketches.countMinEstimate(
      Sketches.countMinBuild(toks(part1.unionByName(part2)), "tok", d, w),
      probes, "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(se == be)
  }

  test("streaming bloom: cross-batch OR-merge equals the batch bitmap") {
    import graft.ops.Sketches
    val part1 = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    val part2 = Seq((3L, "gamma"), (4L, "delta")).toDF("id", "text")
    val flat = Files.createTempDirectory("graft_bloom_flat_").toString
    part1.coalesce(1).write.mode("append").parquet(flat)
    part2.coalesce(1).write.mode("append").parquet(flat)

    val bits = 1 << 10; val hashes = 3
    val stream = spark.readStream.schema(part1.schema)
      .option("maxFilesPerTrigger", 1).parquet(flat)
    val q = Sketches.bloomBuild(stream, "text", bits, hashes).bitmap
      .writeStream.format("memory").queryName("bloom_bits")
      .outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_bloom_ckpt_").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.recentProgress.length >= 2,
      "maxFilesPerTrigger=1 over 2 files must run >= 2 micro-batches")

    val streamedWords = spark.table("bloom_bits")
      .head().getSeq[Long](0)
    val batchWords = Sketches.bloomBuild(
      part1.unionByName(part2), "text", bits, hashes)
      .bitmap.head().getSeq[Long](0)
    assert(streamedWords == batchWords)

    // no false negatives through the shared probe path
    val probes = Seq((1L, "alpha"), (2L, "delta"), (3L, "zz_absent"))
      .toDF("id", "text")
    val mc = Sketches.bloomMightContain(
      Sketches.BloomFilter(spark.table("bloom_bits"), bits, hashes),
      probes, "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(mc(1L) && mc(2L))
  }

  test("stream-static enrichment: dim attr grouped, missing dim rows kept as NULL") {
    val dir = Files.createTempDirectory("graft_enrich_src_").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click", 1.5),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:15:00"), 1L, "click", 2.5),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:25:00"), 2L, "click", 4.0),
      // user 99 has NO dim row: the left join must keep it (NULL segment)
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:35:00"), 99L, "click", 8.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    val dim = Seq((1L, "gold"), (2L, "basic"))
      .toDF("cust_id", "segment")
    val q = enrichedWindowedCounts(eventStream(spark, dir), dim,
      "cust_id", "segment")
      .writeStream.format("memory").queryName("enrich_win")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("enrich_win")
      .collect()
      .map(r => (Option(r.get(1)).map(_.toString), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      (Some("gold"), 2L, 4.0),   // users joined to their segment
      (Some("basic"), 1L, 4.0),
      (None, 1L, 8.0)))          // unmatched user kept under NULL
  }

  test("stream-stream attribution join equals the batch join") {
    val src = stageEvents()
    def side(t: String) =
      eventStream(spark, src).filter($"event_type" === t)
    val out = attributionJoin(side("purchase"), side("click"), 60)
    val q = out.writeStream
      .format("memory").queryName("attr_join")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"purchase_id", $"click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = key(spark.table("attr_join"))
    // batch twin: same join condition over the static table
    val ev = Tables.load(spark, sfDir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("purchase_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("click_user"), $"ts".as("click_ts"))
    val batch = key(p.join(c,
      $"user_id" === $"click_user" &&
        $"click_ts" <= $"purchase_ts" &&
        $"click_ts" >= $"purchase_ts" - expr("INTERVAL 60 MINUTES")))
    // inner stream-stream join with AvailableNow processes all data;
    // watermark expiry can only drop matches the batch also excludes,
    // so the streamed set must equal the batch join exactly
    assert(streamed == batch, s"diff: ${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("streaming IVF index maintenance matches batch assignment and probe") {
    import graft.ops.Similarity
    val e = Tables.load(spark, sfDir, "embeddings").limit(200)
    // centroids trained offline on the same corpus
    val centroids = Similarity.trainCentroids(e, "vec_id", "embedding",
      numCells = 8, lloydIters = 1)

    // stage vectors as a file-stream source in two files (two batches)
    val src = Files.createTempDirectory("graft_vec_src_").toString
    e.filter($"vec_id" % 2 === 0).write.mode("append").parquet(src)
    e.filter($"vec_id" % 2 === 1).write.mode("append").parquet(src)

    val schema = e.schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val indexDir = Files.createTempDirectory("graft_ivf_idx_").toString + "/idx"
    val q = IndexStreams.ivfIndexStream(stream, centroids,
      "vec_id", "embedding", indexDir,
      Files.createTempDirectory("graft_ckpt_").toString)
    try q.processAllAvailable() finally q.stop()

    // streamed index == batch-side cell assignment, row for row
    val streamed = spark.read.parquet(indexDir)
      .select($"neighbor_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = Similarity.indexCells(e, "vec_id", "embedding", centroids)
      .select($"neighbor_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed == batch)
    // cell-partitioned layout on disk (prunable probes)
    assert(Files.list(java.nio.file.Paths.get(indexDir)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("cell=")))

    // probing the streamed index == probing the batch index
    val queries = e.filter($"vec_id" < 5)
    def keyOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"rank", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fromStream = keyOf(IndexStreams.ivfProbe(spark, indexDir,
      queries, "vec_id", "embedding", k = 5, nProbe = 3, centroids))
    val fromBatch = keyOf(Similarity.probeCells(
      Similarity.indexCells(e, "vec_id", "embedding", centroids),
      queries, "vec_id", "embedding", k = 5, nProbe = 3, centroids))
    assert(fromStream == fromBatch)
    assert(fromStream.nonEmpty)
  }

  test("stateful sessionizer emits closed sessions matching the batch twin") {
    val src = stageEvents()
    val events = eventStream(spark, src).as[Event]
    val q = sessionize(events).writeStream
      .format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sessions")
      .select("user_id", "session_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet

    // Batch twin: all sessions; the stream keeps each user's last session
    // open in state, so streamed == batch minus last-session-per-user.
    val batch = graft.queries.CoreQueries.queries("q_sessionize")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("n_events"), r.getAs[Long]("session_start_us")))
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expectClosed = batch.filter(s => s._2 != lastPerUser(s._1))
      .map(s => (s._1, s._4, s._3)).toSet
    assert(streamed == expectClosed)
  }

  test("sessionizer restart: killed mid-ingest, resumes from checkpoint, equals uninterrupted") {
    // The 100 TB continuous-ingest contract: a stateful query stopped
    // after a partial read must RESUME from its checkpoint — offsets
    // (which files were consumed) AND state (the open sessions) — and
    // end bit-equal to a run that never stopped. Sessions are crafted
    // to SPAN the restart boundary: if state were lost, the resumed run
    // would re-open user 1's session at t+20min and the merged
    // 3-event session could never be emitted.
    def ev(id: Long, user: Long, minute: Long) =
      Event(id, new java.sql.Timestamp(minute * 60000L), user, "view", 0.0)
    val root = Files.createTempDirectory("graft_restart_").toString
    val (src, out, chk) = (s"$root/src", s"$root/out", s"$root/chk")
    val gapMin = 30L
    // file A: user 1 starts a session; user 2 opens AND closes one
    Seq(ev(1, 1L, 0), ev(2, 1L, 10), ev(3, 2L, 0))
      .toDF().coalesce(1).write.mode("append").parquet(src)
    def runOnce(outDir: String, chkDir: String): Unit = {
      val q = sessionize(eventStream(spark, src).as[Event], gapMin)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", chkDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "stream did not finish")
    }
    runOnce(out, chk) // consumes file A, then terminates ("the kill")
    // file B lands while the query is DOWN: continues user 1's open
    // session (t+20), then closes it (t+90) and closes user 2's too
    Seq(ev(4, 1L, 20), ev(5, 1L, 90), ev(6, 2L, 95))
      .toDF().coalesce(1).write.mode("append").parquet(src)
    runOnce(out, chk) // resume: same checkpoint, processes ONLY file B
    def sessions(dir: String): Set[(Long, Long, Long, Int)] =
      spark.read.parquet(dir)
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
    val resumed = sessions(out)
    // the cross-boundary merge happened: 3 events, one session
    val us = 60000000L
    assert(resumed.contains((1L, 0L, 20 * us, 3)),
      s"state lost across restart: $resumed")
    // uninterrupted twin over the SAME final source, fresh checkpoint
    runOnce(s"$root/out2", s"$root/chk2")
    assert(resumed == sessions(s"$root/out2") && resumed.size == 2)
  }

  test("streaming dedup drops replayed events within the watermark") {
    // stage events twice (simulating at-least-once replay)
    val dir = Files.createTempDirectory("graft_dup_src_").toString
    val ev = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    ev.write.mode("overwrite").parquet(dir)
    ev.write.mode("append").parquet(dir)

    val q = dedupStream(eventStream(spark, dir), Seq("event_id")).writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("dedup_out").count() == ev.count())
  }

  test("continuous ingest: batch 2 dedups against what batch 1 accepted") {
    val root = Files.createTempDirectory("graft_ingest_stream_").toString
    val (srcDir, artDir) = (s"$root/src", s"$root/artifacts")
    // seed: a one-doc corpus as the combined artifact table
    val seed = Seq((1L, "seed corpus document about engines")).toDF("doc_id", "text")
    IngestStreams.artifacts(seed, "doc_id", "text").write.parquet(artDir)
    val novel = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // two source files; maxFilesPerTrigger=1 + explicit mtimes force
    // SEQUENTIAL batches in a deterministic order (coarse-mtime
    // filesystems could otherwise tie-break arbitrarily)
    Seq((10L, novel)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$srcDir/b1")
    Seq((20L, novel),                        // exact copy of batch-1 doc
      // near-dup of the batch-1 doc (one token edited): only the
      // SIGNATURES appended after batch 1 can catch this
      (22L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (21L, "totally fresh second wave content with new vocabulary"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$srcDir/b2")
    def touch(dir: String, offsetS: Long): Unit =
      Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala.foreach(p =>
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + offsetS * 1000)))
    touch(s"$srcDir/b1", -60)
    touch(s"$srcDir/b2", 0)
    val uniform = spark.range(64)
      .selectExpr("id as bucket", "CAST(1000000 AS LONG) as w_scaled")
    val stream = spark.readStream
      .schema(seed.schema).option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/*")
    val q = IngestStreams.ingestStream(stream, artDir,
      uniform, "doc_id", "text",
      Files.createTempDirectory("graft_ckpt_").toString,
      numBuckets = 64, trigger = Some(Trigger.AvailableNow()))
    assert(q.awaitTermination(180000), "stream did not finish in time")
    val art = spark.read.parquet(artDir)
    val corpus = art.collect().map(_.getLong(0)).toSet
    // docs 20 (exact) and 22 (near) must be REJECTED: their twins were
    // accepted in an EARLIER micro-batch and are visible only via the
    // artifact rows appended between batches
    assert(corpus == Set(1L, 10L, 21L), s"got $corpus")
    // the one-table design keeps fingerprints and signatures row-consistent
    assert(art.filter($"fingerprint".isNull || $"h0".isNull).count() == 0)
  }

  test("streaming quota sample: single-batch run equals the batch sample") {
    val root = Files.createTempDirectory("graft_quota_stream_").toString
    val src = s"$root/src"
    val all = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"source")
    all.coalesce(1).write.parquet(src)
    val quota = 7
    val q = SampleStreams.quotaStream(
      spark.readStream.schema(all.schema).parquet(src),
      "doc_id", "source", quota)
      .toDF("source", "n_seen", "rank", "doc_id")
      .writeStream.format("memory").queryName("quota_single")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    val streamed = spark.table("quota_single")
      .select($"source", $"rank", $"doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val batch = graft.ops.Sampling.quotaSample(all, "doc_id", "source", quota)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming quota sample: reservoir carries and merges across batches") {
    import org.apache.spark.sql.streaming.TestGroupState
    // Direct state-transition test with Spark's TestGroupState: batch 2
    // must merge NEW smaller priorities into the batch-1 reservoir — a
    // carry failure would freeze batch 1's winners. The engine-level
    // state-store recovery machinery is pinned separately by the
    // sessionizer/funnel/transition restart specs.
    def k(id: Long) = SampleStreams.Keyed("s", id,
      // descending synthetic priorities so later rows WIN: ord = -id
      -id)
    val quota = 3
    val state = TestGroupState.create[SampleStreams.Reservoir](
      org.apache.spark.api.java.Optional.empty[SampleStreams.Reservoir](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      1000L, org.apache.spark.api.java.Optional.empty[java.lang.Long]()
        .asInstanceOf[org.apache.spark.api.java.Optional[Long]],
      hasTimedOut = false)
    // batch 1: ids 1..4 → reservoir = bottom-3 of ords(-4,-3,-2,-1)
    val out1 = SampleStreams.quotaUpdate(quota)(
      "s", Iterator(k(1), k(2), k(3), k(4)), state).toSeq
    assert(out1.map(_._4) == Seq(4L, 3L, 2L)) // ord asc = id desc
    assert(out1.forall(_._2 == 4L))
    // batch 2 over CARRIED state: 10 and 11 beat everything; 0 loses
    val out2 = SampleStreams.quotaUpdate(quota)(
      "s", Iterator(k(10), k(0), k(11)), state).toSeq
    assert(out2.map(_._4) == Seq(11L, 10L, 4L),
      s"batch-2 reservoir must merge carried state: $out2")
    assert(out2.forall(_._2 == 7L)) // n_seen accumulated across batches
    // batch 3 with no reservoir-changing rows emits nothing
    val out3 = SampleStreams.quotaUpdate(quota)(
      "s", Iterator(k(-5)), state).toSeq
    assert(out3.isEmpty)
    assert(state.get.nSeen == 8L)
  }

  test("cdc stream applies micro-batches through the shared materializer") {
    val whDir = Files.createTempDirectory("graft_wh_").toString
    val wh = new Warehouse(spark, whDir, StateStore(whDir + "/state"))
    val cfg = ModelConfig("stream_snapshot", materialized = "cdc",
      uniqueKey = Some("user_id"))

    // stream of per-user latest events as upserts (no op column -> 'U')
    val src = Files.createTempDirectory("graft_cdc_src_").toString
    Tables.load(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"event_type", $"value")
      .write.mode("overwrite").parquet(src)
    val changes = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)

    val q = EventStreams.cdcStream(changes, wh, cfg,
      Files.createTempDirectory("graft_ckpt_").toString)
    q.processAllAvailable()
    q.stop()

    val snap = wh.read("stream_snapshot")
    // one row per user after the upsert merge
    assert(snap.groupBy("user_id").count().filter($"count" > 1).count() == 0)
    assert(snap.count() == Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count())
  }
}
