package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation with a deployment-selectable durability level.
  *
  * Iterative operators ([[graft.ops.Dedup.duplicateClusters]]'s label
  * propagation, [[graft.ops.CurationPipeline]]'s multi-consumer split)
  * must truncate lineage each round or the plan grows unboundedly and
  * every convergence check re-executes the whole history. Two ways to
  * truncate:
  *
  *   - `localCheckpoint` (default): blocks are materialized on executor
  *     local storage. Fast — no distributed filesystem round-trip — but
  *     NOT fault-tolerant: losing an executor loses its blocks and,
  *     with lineage truncated, the job cannot recompute them. The right
  *     trade on a single machine (tests, local[32] bench) and for jobs
  *     cheap enough to simply rerun.
  *   - reliable `checkpoint`: blocks are written to the SparkContext's
  *     checkpoint directory (HDFS/object store on a cluster). Survives
  *     executor loss — the right trade for thousand-executor runs where
  *     some executor loss per hour is the expected case, not the
  *     exception.
  *
  * Selection is by session conf so a deployment flips ONE switch
  * (`spark.graft.reliableCheckpoints=true` + `sc.setCheckpointDir`)
  * without threading a parameter through every operator signature.
  *
  * Storage lifecycle in reliable mode: Spark does NOT delete checkpoint
  * data when the frame is garbage-collected unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a static
  * conf, off by default). Iterative operators checkpoint once per round,
  * so long-lived reliable-mode applications should set that cleaner
  * conf at submit time — or point the checkpoint dir at storage with a
  * TTL/lifecycle rule — to avoid accumulating one materialized copy per
  * round until application exit.
  */
object Checkpoints {

  /** Session conf key; unset/false = localCheckpoint, true = reliable. */
  val ReliableConfKey = "spark.graft.reliableCheckpoints"

  /** True when this session asks for reliable (executor-loss-safe)
    * checkpoints. */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.get(ReliableConfKey, "false").toBoolean

  /** Truncate `df`'s lineage eagerly, honoring the session's durability
    * conf. Both paths are eager (the returned frame is materialized), so
    * callers can treat the result as a stable round snapshot. */
  def truncate(df: DataFrame): DataFrame =
    if (reliable(df)) {
      if (df.sparkSession.sparkContext.getCheckpointDir.isEmpty)
        throw new IllegalStateException(
          s"$ReliableConfKey=true but no checkpoint directory is set; " +
            "call sparkContext.setCheckpointDir(<reliable storage path>) first")
      df.checkpoint()
    } else df.localCheckpoint()
}
