package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import scala.jdk.CollectionConverters._

/** Kill-and-resume recovery for every stateful streaming operator
  * beyond the sessionizer (whose restart contract is pinned in
  * StreamingSpec): a query stopped after a partial read must RESUME
  * from its checkpoint — source offsets AND carried state — and end
  * equal to a run that never stopped. Each scenario plants state that
  * SPANS the restart boundary, so a state-losing implementation fails
  * the assertion, not just slows down.
  */
class RestartRecoverySpec extends SparkSpec {
  import spark.implicits._
  import EventStreams._

  private def ev(id: Long, user: Long, minute: Long, typ: String) =
    Event(id, new java.sql.Timestamp(minute * 60000L), user, typ, 0.0)

  private val us = 60000000L // micros per minute

  test("funnel restart: chain carried across the kill, equals uninterrupted") {
    val root = Files.createTempDirectory("graft_funnel_restart_").toString
    val (src, out, chk) = (s"$root/src", s"$root/out", s"$root/chk")
    val steps = Seq("view", "click", "purchase")
    def runOnce(outDir: String, chkDir: String): Unit = {
      val q = funnelStream(typedEvents(eventStream(spark, src)), steps)
        .toDF("user_id", "n_steps", "ts_us")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", chkDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "stream did not finish")
    }
    // file A: user 1 reaches step 2; user 2 anchors at step 1
    Seq(ev(1, 1L, 0, "view"), ev(2, 1L, 10, "click"), ev(3, 2L, 0, "view"))
      .toDF().coalesce(1).write.mode("append").parquet(src)
    runOnce(out, chk) // "the kill"
    // file B lands while the query is DOWN. Completing events only:
    // user 1's purchase extends a chain that exists ONLY in state
    // (a state-losing resume sees a lone purchase — not the first
    // step — and emits nothing); user 2's purchase must be IGNORED
    // (their chain awaits a click), then the click extends to step 2.
    Seq(ev(4, 1L, 20, "purchase"), ev(5, 2L, 25, "purchase"),
      ev(6, 2L, 30, "click"))
      .toDF().coalesce(1).write.mode("append").parquet(src)
    runOnce(out, chk) // resume: same checkpoint, processes ONLY file B

    // a user's funnel position = their DEEPEST emitted row
    def deepest(dir: String): Map[Long, (Int, Seq[Long])] =
      spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getSeq[Long](2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
    val resumed = deepest(out)
    assert(resumed(1L) == ((3, Seq(0L, 10 * us, 20 * us))),
      s"funnel state lost across restart: $resumed")
    assert(resumed(2L) == ((2, Seq(0L, 30 * us))), s"got $resumed")
    // uninterrupted twin over the SAME final source, fresh checkpoint
    runOnce(s"$root/out2", s"$root/chk2")
    assert(resumed == deepest(s"$root/out2"))
  }

  test("transition restart: last-event cell carried across the kill") {
    val root = Files.createTempDirectory("graft_trans_restart_").toString
    val (src, out, chk) = (s"$root/src", s"$root/out", s"$root/chk")
    def runOnce(outDir: String, chkDir: String): Unit = {
      val q = transitionStream(typedEvents(eventStream(spark, src)))
        .toDF("from_type", "to_type")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", chkDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "stream did not finish")
    }
    // file A: user 1 emits (view, click); user 2 just anchors
    Seq(ev(1, 1L, 0, "view"), ev(2, 1L, 10, "click"), ev(3, 2L, 5, "view"))
      .toDF().coalesce(1).write.mode("append").parquet(src)
    runOnce(out, chk)
    // file B: each user's next event pairs against a last-event cell
    // that exists ONLY in state — a state-losing resume emits nothing
    Seq(ev(4, 1L, 20, "purchase"), ev(5, 2L, 15, "click"))
      .toDF().coalesce(1).write.mode("append").parquet(src)
    runOnce(out, chk)

    def counts(dir: String): Map[(String, String), Long] =
      spark.read.parquet(dir).groupBy("from_type", "to_type").count()
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
        .toMap
    val resumed = counts(out)
    assert(resumed == Map(("view", "click") -> 2L,
        ("click", "purchase") -> 1L),
      s"transition state lost across restart: $resumed")
    // uninterrupted twin: same final source, fresh checkpoint
    runOnce(s"$root/out2", s"$root/chk2")
    assert(resumed == counts(s"$root/out2"))
  }

  test("ingest restart: offsets skip consumed files, artifacts carry the corpus") {
    val root = Files.createTempDirectory("graft_ingest_restart_").toString
    val (srcDir, artDir, chk) = (s"$root/src", s"$root/artifacts", s"$root/chk")
    val seed = Seq((1L, "seed corpus document about engines"))
      .toDF("doc_id", "text")
    def seedArtifacts(dir: String): Unit =
      IngestStreams.artifacts(seed, "doc_id", "text").write.parquet(dir)
    seedArtifacts(artDir)
    val uniform = spark.range(64)
      .selectExpr("id as bucket", "CAST(1000000 AS LONG) as w_scaled")
    def runOnce(aDir: String, chkDir: String): Unit = {
      val stream = spark.readStream.schema(seed.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*")
      val q = IngestStreams.ingestStream(stream, aDir, uniform,
        "doc_id", "text", chkDir, numBuckets = 64,
        trigger = Some(Trigger.AvailableNow()))
      assert(q.awaitTermination(180000), "stream did not finish")
    }
    val novel = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq((10L, novel)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$srcDir/b1")
    runOnce(artDir, chk) // consumes b1, accepts doc 10, then "dies"
    // b2 lands while the query is DOWN: an exact copy of the doc
    // accepted in b1 (must be REJECTED via the artifact rows appended
    // before the kill) and a fresh doc (accepted)
    Seq((20L, novel),
      (21L, "totally fresh second wave content with new vocabulary"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$srcDir/b2")
    runOnce(artDir, chk) // resume: offsets say b1 is consumed
    val art = spark.read.parquet(artDir)
    val corpus = art.collect().map(_.getLong(0)).toSet
    assert(corpus == Set(1L, 10L, 21L), s"got $corpus")
    // offsets held: a replayed b1 would have re-appended doc 10
    assert(art.count() == art.select("doc_id").distinct().count(),
      "resume replayed an already-consumed file (duplicated artifact rows)")

    // uninterrupted twin: fresh artifacts + checkpoint, both files
    // visible from the start, forced into deterministic batch order
    def touch(dir: String, offsetS: Long): Unit =
      Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala.foreach(p =>
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + offsetS * 1000)))
    touch(s"$srcDir/b1", -60)
    touch(s"$srcDir/b2", 0)
    val art2Dir = s"$root/artifacts2"
    seedArtifacts(art2Dir)
    runOnce(art2Dir, s"$root/chk2")
    val corpus2 = spark.read.parquet(art2Dir)
      .collect().map(_.getLong(0)).toSet
    assert(corpus == corpus2, s"resumed $corpus != uninterrupted $corpus2")
  }
}
