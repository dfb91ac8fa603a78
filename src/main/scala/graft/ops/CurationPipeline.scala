package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The standard raw-crawl → training-corpus funnel, composed from the
  * library's operators — what a user of the engine actually runs
  * end-to-end:
  *
  *   1. exact dedup (verbatim copies; keep the smallest id),
  *   2. near-dup dedup (MinHash LSH → connected components → keep each
  *      cluster's canonical member),
  *   3. decontamination against a held-out eval set (≥ minShared shared
  *      shingles ⇒ drop the training doc),
  *   4. heuristic quality filter (TextOps.qualityScore ≥ minQuality),
  *   5. leakage-safe train/val/test split keyed on the near-dup cluster
  *      (a test doc can never have a near-copy in train),
  *   6. concat-and-chunk sequence packing of the train split.
  *
  * Every stage is one of the individually-oracled operators; the
  * composition itself is pinned end-to-end by CurationPipelineSpec
  * (stage invariants: no surviving near-dup pairs, no contaminated
  * survivors, no cluster straddling a split, packing totality). All
  * stages are linear-in-corpus shapes — keyed joins, aggregates,
  * bucketed windows; never doc×doc.
  *
  * Output: every surviving row of the input corpus (all input columns)
  * plus quality, split, and the packing columns (n_tokens,
  * start_offset, first_seq, last_seq — non-null for the train split
  * only).
  */
object CurationPipeline {

  final case class Config(
      shingleN: Int = 3,
      numHashes: Int = 8,
      bandSize: Int = 2,
      maxBucketSize: Int = 64,
      contaminationN: Int = 7,
      contaminationMinShared: Int = 3,
      contaminationMaxDf: Int = 100,
      minQuality: Double = 0.3,
      trainPct: Int = 80,
      valPct: Int = 10,
      seqLen: Int = 2048)

  def curate(
      df: DataFrame, idCol: String, textCol: String,
      isEval: Column, cfg: Config = Config()): DataFrame = {
    // The eval set is held out from the very start: it must not
    // participate in dedup (a near-dup cluster containing an eval doc
    // would otherwise swallow the eval doc BEFORE decontamination could
    // see it) and is never part of the output corpus. A NULL eval flag
    // counts as not-eval (three-valued !NULL would otherwise silently
    // drop the row from BOTH sides).
    val evalFlag = coalesce(isEval, lit(false))
    val evalSide = df.filter(evalFlag)
    val trainSide = df.filter(!evalFlag)

    // 1. verbatim copies: exact() keeps the smallest id per content hash
    val exactKept = trainSide.join(
      Dedup.exact(trainSide, idCol, textCol).select(col(idCol)),
      Seq(idCol), "left_semi")

    // 2. near-dups: LSH pairs → clusters; canonical (smallest) survives.
    // Pairs are computed once and reused for the leak-safe split below,
    // so the split key agrees with the dedup decision.
    val pairs = Dedup.minHashLsh(exactKept, idCol, textCol,
      cfg.shingleN, cfg.numHashes, cfg.bandSize, cfg.maxBucketSize)
    val clusters = Dedup.duplicateClusters(pairs, "a", "b")
    val nearDropped = clusters.filter(col("a") =!= col("cluster"))
      .select(col("a").as(idCol))
    // cache: the deduped corpus feeds both the contamination join and
    // the survivor anti-join below
    val deduped = exactKept.join(nearDropped, Seq(idCol), "left_anti")
      .cache()

    // 3. decontamination: drop surviving training docs that share
    // >= minShared distinct shingles with any eval doc. The COALESCED
    // flag (not the raw isEval) must flow through: contaminationPairs
    // filters both flag and !flag, so a NULL flag would silently drop
    // the row from BOTH sides — a contaminated doc with a dirty NULL
    // flag would survive decontamination while this pipeline routed it
    // to the training side.
    val contaminated = Dedup.contaminationPairs(
      deduped.unionByName(evalSide), idCol, textCol, cfg.contaminationN,
      evalFlag, cfg.contaminationMinShared, cfg.contaminationMaxDf)
      .select(col(idCol)).distinct()
    val clean = deduped.join(contaminated, Seq(idCol), "left_anti")

    // 4. heuristic quality floor
    // cache: scored feeds BOTH the split computation (its id list seeds
    // the cluster bucketing) and the split join below — uncached, the
    // contamination join + quality scan would execute twice inside the
    // withSplit materialization (measured ~1.5-2 s per extra pass at
    // sf0.1, the pipeline's single largest stage).
    val scored = clean
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .filter(col("quality") >= cfg.minQuality)
      .cache()

    // 5. leakage-safe split on the SAME near-dup clusters (reused — the
    // iterative label propagation runs once, not twice)
    val split = Curation.leakSafeSplitClusters(
      scored.select(col(idCol)), idCol,
      clusters.withColumnRenamed("a", idCol), cfg.trainPct, cfg.valPct)
      .select(col(idCol), col("split"))
    // Checkpoint: everything below (packSequences' driver-side bounds
    // read, its bucketed windows, and the final left join) reads
    // withSplit several times — without truncation each read would
    // re-execute the dedup/contamination/quality lineage. Durability
    // (fast local vs executor-loss-safe reliable) follows the same
    // session conf as duplicateClusters — see graft.Checkpoints.
    val withSplit = graft.Checkpoints.truncate(scored.join(split, Seq(idCol)))
    // The eager truncation above was the caches' last consumer
    // (everything below reads the materialized withSplit) — release
    // both now so repeated curate() calls in a long-lived session
    // (bench reruns, notebooks) don't accumulate cached partitions.
    deduped.unpersist()
    scored.unpersist()

    // 6. pack the train split into fixed-length sequences
    val packed = Curation.packSequences(
      withSplit.filter(col("split") === "train"),
      idCol, TextOps.tokenCount(col(textCol)), cfg.seqLen)
    withSplit.join(packed, Seq(idCol), "left")
  }
}
