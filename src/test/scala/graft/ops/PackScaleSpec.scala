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
    val t0 = System.nanoTime()
    val packed = Curation.packSequences(docs, "doc_id", $"ntok",
      seqLen = 2048, numBuckets = 256).cache()
    // distributed checks only:
    // 1. offsets are a permutation-free gapless layout: for every doc,
    //    start_offset == sum of all earlier docs' tokens. Verified via
    //    the self-join-free identity start_offset + n_tokens ==
    //    next doc's start_offset (window lead), plus first == 0.
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val gaps = packed
      .withColumn("next_start", lead(col("start_offset"), 1).over(w))
      .filter(col("next_start").isNotNull &&
        col("next_start") =!= col("start_offset") + col("n_tokens"))
      .limit(1).count()
    assert(gaps == 0, "layout must be gapless in id order")
    val first = packed.orderBy("doc_id").select("start_offset").head().getLong(0)
    assert(first == 0L)
    // 2. the final sequence index is consistent with the total token count
    val totals = packed.agg(
      sum(col("n_tokens")).as("total"), max(col("last_seq")).as("max_seq"))
      .head()
    val (total, maxSeq) = (totals.getLong(0), totals.getLong(1))
    assert(maxSeq == (total - 1) / 2048)
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(elapsedSec < 120.0, s"packing took $elapsedSec s")
    packed.unpersist()
    ()
  }
}
