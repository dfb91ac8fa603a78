package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end invariants of the composed raw-crawl → training-corpus
  * funnel ([[CurationPipeline]]). Each stage is individually oracled;
  * this spec pins that the COMPOSITION does what the pipeline promises
  * on a corpus engineered to trip every stage at once.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // Distinct >= 10-token sentences with stopwords (each clears the
  // quality floor); each stage's target is engineered independently so
  // one drop reason can't mask another.
  private val s1 =
    "the cat sat on the mat while it was raining outside today"
  private val s2 =
    "every good boy deserves fudge and so does every clever girl nearby"
  private val sEval =
    "results on the held out benchmark show that models improve with scale"

  private val corpus = Seq(
    // near-dup pair: one trailing token apart -> MinHash-collide
    (1L, s1, false),
    (2L, s1 + " indeed", false),
    // exact copies -> stage-1 dedupe keeps the smaller id
    (3L, s2, false),
    (4L, s2, false),
    // contaminated: carries the eval sentence verbatim inside other text
    (5L, "introduction comes first and then " + sEval, false),
    // junk: 13+-char gibberish tokens fail length/stopword/avg-len checks
    (6L, "zzzzzzzzzzzzzzzzz qqqqqqqqqqqqqqqqq wwwwwwwwwwwwwwwww eeeeeeeeeeeeeeeee", false),
    // clean unique survivors
    (7L, "a completely different story about ships sailing across the wide ocean", false),
    (8L, "numbers and letters combine when people write interesting documents for fun", false),
    // the held-out eval doc (doc 5 contains its sentence)
    (9L, sEval, true))
    .toDF("doc_id", "text", "is_eval")

  private lazy val out = CurationPipeline.curate(
    corpus, "doc_id", "text", isEval = col("is_eval"),
    CurationPipeline.Config(
      maxBucketSize = 16, contaminationMinShared = 3,
      contaminationMaxDf = 100, minQuality = 0.3,
      trainPct = 80, valPct = 10, seqLen = 10)).cache()

  private lazy val ids = out.select("doc_id").as[Long].collect().toSet

  test("every stage drops exactly its targets") {
    assert(!ids.contains(4L), "exact duplicate must dedupe to the smaller id")
    assert(ids.contains(3L))
    // near-dup pair 1/2: canonical (smaller) survives
    assert(ids.contains(1L) && !ids.contains(2L))
    assert(!ids.contains(5L), "doc sharing the eval tail must be decontaminated")
    assert(!ids.contains(6L), "junk must fall below the quality floor")
    assert(!ids.contains(9L), "the eval doc itself is held out")
    assert(ids.contains(7L) && ids.contains(8L))
  }

  test("no surviving near-dup pair, and splits are leak-safe by construction") {
    val surviving = CurationPipeline.curate(
      corpus, "doc_id", "text", col("is_eval"))
    val pairs = Dedup.minHashLsh(
      surviving.select($"doc_id", $"text"), "doc_id", "text", 3, 8, 2)
    assert(pairs.count() == 0, "canonical-only corpus has no LSH pair left")
    // split column present and total
    val splits = out.select("split").as[String].collect()
    assert(splits.nonEmpty && splits.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("a contaminated doc with a NULL eval flag is still decontaminated") {
    // The documented contract is "NULL counts as not-eval": a dirty row
    // with a NULL flag is routed to the training side — and must then
    // be visible to decontamination like any other training doc. (The
    // regression: passing the raw flag into contaminationPairs made
    // filter(flag)/filter(!flag) BOTH drop the NULL row, so it could
    // never be flagged contaminated.)
    val dirty = Seq(
      (1L, "introduction comes first and then " + sEval, null.asInstanceOf[java.lang.Boolean]),
      (2L, "a completely different story about ships sailing across the wide ocean",
        java.lang.Boolean.FALSE),
      (9L, sEval, java.lang.Boolean.TRUE))
      .toDF("doc_id", "text", "is_eval")
    val kept = CurationPipeline.curate(dirty, "doc_id", "text", col("is_eval"))
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(1L),
      "NULL-flag doc carrying the eval sentence must be dropped as contaminated")
    assert(kept.contains(2L))
    assert(!kept.contains(9L), "the eval doc itself is held out")
  }

  test("train split is packed; other splits carry null packing columns") {
    val rows = out.select($"doc_id", $"split", $"start_offset", $"n_tokens")
      .collect()
    rows.foreach { r =>
      if (r.getString(1) == "train") assert(!r.isNullAt(2))
      else assert(r.isNullAt(2))
    }
    // packing totality: offsets are the cumulative token layout in id order
    val train = rows.filter(_.getString(1) == "train")
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    var off = 0L
    train.foreach { case (_, start, n) =>
      assert(start == off, "packing offsets must be gapless in id order")
      off += n
    }
  }
}
