package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.{Dedup, IngestPipeline, TextOps}

/** Continuous corpus ingestion (the streaming driver of SURVEY §2
  * C62): each arriving micro-batch of raw documents runs the full
  * [[IngestPipeline.ingest]] funnel against the corpus's CURRENT
  * materialized artifacts, and the accepted survivors update those
  * artifacts — so batch N+1 dedups against everything accepted through
  * batch N, closing the loop a one-shot batch job leaves open.
  *
  * Per micro-batch (foreachBatch — the same bridge the CDC stream
  * uses to share one merge implementation with batch mode):
  *   1. read the fingerprint table and signature index FRESH from
  *      their directories (they grew during earlier batches);
  *   2. run the 4-stage funnel (exact → near → span-clean → quality);
  *   3. append accepted rows (cleaned text) to the corpus directory,
  *      and their fingerprints + MinHash signatures to the artifact
  *      directories.
  *
  * Durability note: the three appends are not one atomic commit — a
  * crash between them can duplicate artifact rows on replay (statuses
  * stay correct: dedup against a duplicated fingerprint row is still
  * dedup). Production deployments put the corpus behind a
  * transactional table format and make step 3 a single commit; the
  * funnel itself is unchanged — same contract as the reference's
  * non-transactional warehouse writes.
  *
  * The directories must be SEEDED (existing corpus artifacts, possibly
  * from an empty corpus's explicit empty write) — reading schema from
  * data keeps this self-contained, exactly like [[IndexStreams]]'
  * index directory contract.
  */
object IngestStreams {

  def ingestStream(
      docs: DataFrame, corpusDir: String, fpDir: String, sigDir: String,
      weights: DataFrame, idCol: String, textCol: String,
      checkpointDir: String,
      shingleSize: Int = 3, numHashes: Int = 8, bandSize: Int = 2,
      minEstimate: Double = 0.5, spanW: Int = 5,
      numBuckets: Int = 4096, minLogit: Double = 0.0,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val w = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fps = spark.read.parquet(fpDir)
        val sigs = spark.read.parquet(sigDir)
        val out = IngestPipeline.ingest(
          batch, fps, sigs, weights, idCol, textCol,
          shingleSize, numHashes, bandSize, minEstimate, spanW,
          numBuckets, minLogit)
        val accepted = out.filter(col("status") === "accepted")
          .select(col(idCol), col("text_clean").as(textCol))
          // the funnel re-reads this frame three times below; one
          // materialization beats three re-plans of the 4-stage funnel
          .localCheckpoint()
        accepted.write.mode("append").parquet(corpusDir)
        accepted
          .select(TextOps.fingerprint(col(textCol)).as("fingerprint"))
          .distinct()
          .write.mode("append").parquet(fpDir)
        Dedup.minHashSignatures(accepted, idCol, textCol,
          shingleSize, numHashes)
          .write.mode("append").parquet(sigDir)
        ()
      }
    trigger.map(w.trigger).getOrElse(w).start()
  }
}
