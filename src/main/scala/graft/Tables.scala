package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet catalog for one scale-factor directory of the driver-generated
  * testdata (TPC-H-ish star schema + events/documents/embeddings).
  *
  * Registers each table as a temp view so both the DataFrame API and
  * `spark.sql` can reach them. Reads are plain parquet scans: column
  * pruning and predicate pushdown stay available to Catalyst (the same
  * layout a 100 TB lake would use, just bigger files and a partitioned
  * directory scheme).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, table: String): String = s"$dir/$table.parquet"

  /** Normalizes `events.ts` to TimestampType across every layout the
    * testdata has shipped in:
    *   - TIMESTAMP(NANOS): Spark has no native type; with
    *     `nanosAsLong=true` it arrives as LongType nanos, which we
    *     floor-divide to micros — the same truncation DuckDB applies.
    *   - Timestamp(isAdjustedToUTC=false, MICROS): arrives as
    *     timestamp_ntz (under default inferTimestampNTZ) — cast to
    *     TimestampType. Session TZ is UTC on both engines, so the
    *     instant is unchanged.
    *   - Timestamp(isAdjustedToUTC=true, MICROS): already TimestampType.
    * [[sessionConfigs]] also disables NTZ inference so a stock reader
    * sees plain timestamps, but the cast below keeps `load` correct even
    * on sessions that miss the config.
    */
  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    loadCache.computeIfAbsent((spark, dir, table), _ => {
      val df = spark.read.parquet(path(dir, table))
      df.schema.find(_.name == "ts").map(_.dataType) match {
        case Some(LongType) =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case Some(TimestampNTZType) =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    })

  // `spark.read.parquet` lists files and reads footers for schema on
  // EVERY call — ~30-80 ms per table, and Verify/Bench construct each
  // query fresh (twice per bench sample), so the probes dominated the
  // small-SF per-query intercept (registerAll alone measured 0.85 s).
  // The testdata is immutable for a session's lifetime, so the plan
  // (with its captured file index) is safely memoized per (session,
  // dir, table). Bounded: sessions-per-JVM × dirs × 10 tables.
  private val loadCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** Session configs required to read the testdata. Apply on every builder. */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.extensions" -> "graft.GraftExtensions",
    // Default streaming checkpoint base on RAM-backed scratch: without
    // it, every checkpoint-less stream (the bench/Verify AvailableNow
    // queries) puts its offset/commit logs and fsync'd state-store
    // deltas under java.io.tmpdir — on this host a real disk, charging
    // each micro-batch a run of disk fsyncs. Queries that need durable
    // or resumable checkpoints pass an explicit checkpointLocation,
    // which overrides this. Cleaned on JVM exit by Scratch.
    "spark.sql.streaming.checkpointLocation" ->
      Scratch.dir("graft_stream_ck_"))

  /** Register all tables as temp views for SQL access. Idempotent, and
    * memoized per (session, dir): re-registering identical views costs
    * catalog churn for nothing, and every framework query calls this.
    * Switching the SAME session to a different dir re-registers (the
    * views must re-point). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (!registeredDir.get(spark).contains(dir)) {
      names.foreach { t =>
        load(spark, dir, t).createOrReplaceTempView(t)
      }
      registeredDir.put(spark, dir)
    }

  private val registeredDir = scala.collection.concurrent.TrieMap
    .empty[SparkSession, String]
}
