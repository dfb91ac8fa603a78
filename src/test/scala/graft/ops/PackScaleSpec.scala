package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Slow-tagged scale guard for sequence packing: the two-level prefix
  * sum must stay distributed and correct at corpus scale (10^6 docs),
  * verified without any million-row driver collect.
  */
class PackScaleSpec extends SparkSpec {

  test("packSequences packs 10^6 docs correctly in bounded time", SlowTest) {
    import spark.implicits._
    val n = 1000000L
    // deterministic pseudo-random token counts in [1, 200]: a pure
    // function of id, so the expected layout is computable analytically
    val docs = spark.range(n)
      .select($"id".as("doc_id"), ($"id" * 2654435761L % 200L + 1L).as("ntok"))
    val load0 = sampleLoad()
    val t0 = System.nanoTime()
    val packed = Curation.packSequences(docs, "doc_id", $"ntok",
      seqLen = 2048, numBuckets = 256).cache()
    // Distributed checks only — the verification must not itself funnel
    // 10^6 rows through a single-partition global window:
    // 1. gapless layout, two levels: WITHIN id buckets the window is
    //    partitioned (parallel); ACROSS buckets only the ~100 bucket
    //    summary rows see an unpartitioned window.
    val bucketed = packed.withColumn("bk", expr("doc_id div 10000"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bk")).orderBy(col("doc_id"))
    val gapsWithin = bucketed
      .withColumn("next_start", lead(col("start_offset"), 1).over(wIn))
      .filter(col("next_start").isNotNull &&
        col("next_start") =!= col("start_offset") + col("n_tokens"))
      .limit(1).count()
    assert(gapsWithin == 0, "layout must be gapless within id buckets")
    val wBk = org.apache.spark.sql.expressions.Window.orderBy(col("bk"))
    val gapsAcross = bucketed.groupBy(col("bk"))
      .agg(min(col("start_offset")).as("bstart"),
        max(col("start_offset") + col("n_tokens")).as("bend"))
      .withColumn("next_bstart", lead(col("bstart"), 1).over(wBk))
      .filter(col("next_bstart").isNotNull &&
        col("next_bstart") =!= col("bend"))
      .limit(1).count()
    assert(gapsAcross == 0, "layout must be continuous across buckets")
    val first = packed.agg(min(col("start_offset"))).head().getLong(0)
    assert(first == 0L)
    // 2. the final sequence index is consistent with the total token count
    val totals = packed.agg(
      sum(col("n_tokens")).as("total"), max(col("last_seq")).as("max_seq"))
      .head()
    val (total, maxSeq) = (totals.getLong(0), totals.getLong(1))
    assert(maxSeq == (total - 1) / 2048)
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val bound = loadScaledBound(120.0, load0)
    assert(elapsedSec < bound, s"packing took $elapsedSec s (bound $bound s)")
    packed.unpersist()
    ()
  }
}
