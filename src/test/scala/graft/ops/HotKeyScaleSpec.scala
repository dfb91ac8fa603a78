package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Slow-tagged adversarial guard for the window-hash family's hot-key
  * escape hatches: ONE w-token window (equivalently one fingerprint)
  * repeated 10^6 times — the boilerplate worst case where the default
  * single-window count funnels every occurrence through one task. The
  * capped / skewSafe paths must stay distributed (map-side partial
  * aggregation absorbs the hot key) and finish in bounded time.
  */
class HotKeyScaleSpec extends SparkSpec {

  private def hotCorpus(n: Long) = {
    import spark.implicits._
    // every doc is the same 5 tokens -> exactly one 5-token window per
    // doc, all sharing one md5; fingerprints likewise all identical
    spark.range(n).select($"id".as("doc_id"),
      lit("alpha beta gamma delta epsilon").as("text"),
      lit("en").as("lang"),
      (concat(lit("src"), $"id" % 4)).as("source"))
  }

  test("windowDups cap drops a 10^6x window without a hot task", SlowTest) {
    val n = 1000000L
    val load0 = sampleLoad()
    val t0 = System.nanoTime()
    // cap 100: the lone window occurs 10^6 > 100 times -> every
    // position dropped (certain boilerplate, no per-position signal)
    val out = Dedup.windowDups(hotCorpus(n).toDF(), "doc_id", "text", 5,
      maxOccurrences = 100)
    assert(out.count() == 0L)
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val bound = loadScaledBound(120.0, load0)
    assert(elapsedSec < bound, s"capped windowDups took $elapsedSec s (bound $bound s)")
  }

  test("windowDupStats skewSafe counts a 10^6x window exactly", SlowTest) {
    val n = 1000000L
    val load0 = sampleLoad()
    val t0 = System.nanoTime()
    val stats = Dedup.windowDupStats(hotCorpus(n).toDF(), "doc_id", "text", 5,
      skewSafe = true)
    // every doc: 1 window, duplicated (10^6 occurrences), dup_frac 1.0
    val agg = stats.agg(count(lit(1)), sum(col("n_dup")),
      min(col("dup_frac")), max(col("dup_frac"))).head()
    assert(agg.getLong(0) == n && agg.getLong(1) == n)
    assert(agg.getDouble(2) == 1.0 && agg.getDouble(3) == 1.0)
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val bound = loadScaledBound(120.0, load0)
    assert(elapsedSec < bound, s"skewSafe stats took $elapsedSec s (bound $bound s)")
  }

  test("corpusReport skewSafe handles a 10^6x fingerprint", SlowTest) {
    val n = 1000000L
    val load0 = sampleLoad()
    val t0 = System.nanoTime()
    val rep = CorpusStats.corpusReport(hotCorpus(n).toDF(), skewSafe = true)
      .collect()
    assert(rep.length == 4) // src0..src3
    assert(rep.map(_.getLong(1)).sum == n)      // n_docs
    assert(rep.map(_.getLong(4)).sum == n)      // every doc is a dup
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val bound = loadScaledBound(120.0, load0)
    assert(elapsedSec < bound, s"skewSafe report took $elapsedSec s (bound $bound s)")
  }
}
