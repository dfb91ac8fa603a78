package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit coverage for the retrieval + span-dedup layer (SURVEY §2
  * C49–C51): exact substring duplication, rational-idf BM25, SemDeDup.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------ C49: window dup stats

  test("window dups: cross-doc and within-doc repeats flagged, short docs NULL") {
    val df = Seq(
      (1L, "a b c d e f"),      // w=3 windows: abc bcd cde def
      (2L, "z b c d q"),        // shares window "b c d" with doc 1
      (3L, "x y x y x y"),      // xyx yxy xyx yxy — all self-duplicated
      (4L, "p q")               // too short for any 3-window
    ).toDF("doc_id", "text")
    val out = Dedup.windowDupStats(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(1L) == ((4L, 1L, Some(0.25))))  // only "b c d" duplicated
    assert(out(2L) == ((3L, 1L, Some(1.0 / 3.0))))
    assert(out(3L) == ((4L, 4L, Some(1.0))))   // fully self-repeating
    assert(out(4L) == ((0L, 0L, None)))        // no windows → NULL fraction
  }

  test("window dups: per-position rows carry corpus-wide occurrence counts") {
    val df = Seq((1L, "a b c d"), (2L, "a b c")).toDF("doc_id", "text")
    val rows = Dedup.windowDups(df, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // "a b c" occurs at doc1 pos0 and doc2 pos0 (n_occ 2); "b c d" once
    assert(rows.toSet == Set((1L, 0, 2L), (1L, 1, 1L), (2L, 0, 2L)))
  }

  test("window dups: occurrence cap drops hot windows, keeps the rest intact") {
    // "b c d" occurs 3× (boilerplate); cap 2 drops all three positions
    val df = Seq((1L, "a b c d e"), (2L, "b c d"), (3L, "z b c d"))
      .toDF("doc_id", "text")
    val base = Dedup.windowDups(df, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3))).toSet
    val capped = Dedup.windowDups(df, "doc_id", "text", 3, maxOccurrences = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3))).toSet
    assert(base.count(_._3 == 3L) == 3) // the hot window really exists
    assert(capped == base.filter(_._3 <= 2L))
  }

  test("windowDupStats: skew-safe aggregate path is output-identical") {
    val df = Seq((1L, "a b c d e f"), (2L, "z b c d q"),
      (3L, "x y x y x y"), (4L, "p q")).toDF("doc_id", "text")
    val dflt = Dedup.windowDupStats(df, "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    val safe = Dedup.windowDupStats(df, "doc_id", "text", 3, skewSafe = true)
      .collect().map(_.toSeq).toSet
    assert(dflt == safe)
  }

  test("span removal: occurrence cap purges boilerplate windows entirely") {
    // The 3-occurrence window is purged EVERYWHERE (no keep-first
    // survivor); the 2-occurrence window still keeps its first copy.
    val df = Seq(
      (1L, "x y z w v"), (2L, "x y z w v"), (3L, "x y z w v"),
      (4L, "a b c d e"), (5L, "a b c d e")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", 5,
      maxOccurrences = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "" && out(2L) == "" && out(3L) == "")
    assert(out(4L) == "a b c d e" && out(5L) == "")
  }

  test("span removal: a non-binding cap reproduces the default keep-first output") {
    val df = Seq((1L, "a b c d e f"), (2L, "p q a b c d e r"))
      .toDF("doc_id", "text")
    val dflt = Dedup.removeDuplicateSpans(df, "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    val capped = Dedup.removeDuplicateSpans(df, "doc_id", "text", 3,
      maxOccurrences = 100).collect().map(_.toSeq).toSet
    assert(dflt == capped)
  }

  // --------------------------------------------- C50: BM25 rational idf

  private val bmDocs = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "durian durian durian")).toDF("doc_id", "text")

  test("bm25: hand-derived score, tf saturation, rarity ordering") {
    val q = Seq((0, "apple"), (1, "durian cherry")).toDF("query_id", "qtext")
    val out = Retrieval.bm25(bmDocs, q, "doc_id", "text", "query_id", "qtext")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // Same arithmetic as the operator (and the DuckDB oracle): exact
    // re-derivation, not an approximate bound.
    val n = 3.0; val avgdl = 8.0 / 3.0
    def score(tf: Double, df: Double, dl: Double): Long = {
      val idf = (n - df + 0.5) / (df + 0.5)
      val tfc = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
      math.floor((idf * tfc) * 1e6).toLong
    }
    assert(out((0, 1)) == ((1L, score(2, 2, 3), 1L))) // apple×2 beats apple×1
    assert(out((0, 2)) == ((2L, score(1, 2, 2), 1L)))
    assert(!out.contains((0, 3)))                     // doc3 has no query term
    // query 1: doc3 matches rare 'durian', doc2 matches 'cherry' (also
    // df=1) — doc3's tf=3 saturates higher
    assert(out((1, 1)) == ((3L, score(3, 1, 3), 1L)))
    assert(out((1, 2)) == ((2L, score(1, 1, 2), 1L)))
  }

  test("bm25: out-of-vocabulary query terms contribute nothing") {
    val q = Seq((0, "apple"), (1, "apple zebra")).toDF("query_id", "qtext")
    val out = Retrieval.bm25(bmDocs, q, "doc_id", "text", "query_id", "qtext")
      .collect().map(r => ((r.getInt(0), r.getLong(2)), r.getLong(3))).toMap
    assert(out((0, 1L)) == out((1, 1L)) && out((0, 2L)) == out((1, 2L)))
  }

  test("bm25: k bounds results per query; ties break on smaller doc id") {
    val docs = Seq.tabulate(6)(i => (i.toLong, "same text here")).toDF("doc_id", "text")
    val q = Seq((0, "same")).toDF("query_id", "qtext")
    val out = Retrieval.bm25(docs, q, "doc_id", "text", "query_id", "qtext", k = 4)
      .orderBy("rank").collect().map(r => r.getLong(2))
    assert(out.toSeq == Seq(0L, 1L, 2L, 3L)) // identical scores → id order
  }

  test("bm25: empty corpus yields empty result, not a failure") {
    val q = Seq((0, "apple")).toDF("query_id", "qtext")
    assert(Retrieval.bm25(bmDocs.limit(0), q,
      "doc_id", "text", "query_id", "qtext").count() == 0)
  }

  // ------------------------- C62: composed incremental-ingest funnel

  test("ingest funnel: each stage catches its planted doc, survivors cleaned") {
    val corpusDoc = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq((1L, corpusDoc),
      (2L, "completely unrelated corpus content about query engines at scale"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, corpusDoc),  // exact copy of corpus doc 1
      (11L, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // near-dup
      (12L, "alpha beta gamma delta epsilon zeta eta theta iota"),  // clean
      // shares a 5-token span with doc 12 (later id → span removed)
      (13L, "prefix words here alpha beta gamma delta epsilon and a different tail")
    ).toDF("doc_id", "text")
    // uniform positive weights: quality accepts anything with features
    val uniform = spark.range(64)
      .selectExpr("id as bucket", "CAST(1000000 AS LONG) as w_scaled")
    val out = IngestPipeline.ingest(batch,
      Dedup.exact(corpus, "doc_id", "text").select(col("fingerprint")),
      Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 8),
      uniform, "doc_id", "text", spanW = 5, numBuckets = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(3)).map(_.toString))).toMap
    assert(out(10L)._1 == "dup_exact")
    assert(out(11L)._1 == "dup_near")
    assert(out(12L) == (("accepted",
      Some("alpha beta gamma delta epsilon zeta eta theta iota"))))
    // doc 13 survives but its copied span is cut (keep-first: 12 < 13)
    assert(out(13L)._1 == "accepted")
    assert(out(13L)._2 == Some("prefix words here and a different tail"))
  }

  test("ingest funnel: intra-batch exact twin rejected; span-emptied doc retained") {
    val corpus = Seq((1L, "unrelated corpus body")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c d e f g h i j"),
      (11L, "a b c d e f g h i j"),  // exact twin INSIDE the batch
      // strict suffix of doc 10: every 5-window it has already occurs
      // there, so span cleaning empties it → low_quality, row retained
      (12L, "b c d e f g h i j")
    ).toDF("doc_id", "text")
    val uniform = spark.range(64)
      .selectExpr("id as bucket", "CAST(1000000 AS LONG) as w_scaled")
    val out = IngestPipeline.ingest(batch,
      Dedup.exact(corpus, "doc_id", "text").select(col("fingerprint")),
      Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 8),
      uniform, "doc_id", "text", spanW = 5, numBuckets = 64,
      // suffix docs are near-dups too; disable the near stage so the
      // span path is what classifies doc 12
      minEstimate = 1.1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "accepted", 11L -> "dup_exact",
      12L -> "low_quality"))
  }

  test("ingest funnel: NULL-text docs are unjudgeable, not exact dups of each other") {
    val corpus = Seq((1L, "corpus body text")).toDF("doc_id", "text")
    val uniform = spark.range(64)
      .selectExpr("id as bucket", "CAST(1000000 AS LONG) as w_scaled")
    val batch = Seq(
      (10L, null.asInstanceOf[String]),
      (11L, null.asInstanceOf[String]), // NOT a dup of doc 10 — no evidence
      (12L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val out = IngestPipeline.ingest(batch,
      Dedup.exact(corpus, "doc_id", "text").select(col("fingerprint")),
      Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 8),
      uniform, "doc_id", "text", spanW = 5, numBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // both NULL-text docs fall through to the quality gate (featureless
    // → low_quality), neither is marked dup_exact on zero evidence
    assert(out == Map(10L -> "low_quality", 11L -> "low_quality",
      12L -> "accepted"))
  }

  test("ingest funnel: duplicate batch ids collapse to one deterministic row") {
    val corpus = Seq((1L, "unrelated corpus body")).toDF("doc_id", "text")
    val uniform = spark.range(64)
      .selectExpr("id as bucket", "CAST(1000000 AS LONG) as w_scaled")
    val batch = Seq(
      (10L, "kept smallest text variant"),
      (10L, "zzz later variant must not fan out the joins"),
      (11L, "some unique body here")
    ).toDF("doc_id", "text")
    val rows = IngestPipeline.ingest(batch,
      Dedup.exact(corpus, "doc_id", "text").select(col("fingerprint")),
      Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 8),
      uniform, "doc_id", "text", spanW = 5, numBuckets = 64)
      .collect()
    assert(rows.length == 2) // exactly one row per distinct id
    val byId = rows.map(r => r.getLong(0) ->
      (r.getString(1), r.getString(3))).toMap
    assert(byId(10L) == (("accepted", "kept smallest text variant")))
    assert(byId(11L)._1 == "accepted")
  }

  // ----------------------------------- C61: corpus snapshot diff

  test("snapshot diff: added/removed/changed/unchanged, NULL text handled") {
    val v1 = Seq((1L, "same"), (2L, "old"), (3L, "gone"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new"), (5L, "fresh"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = CorpusStats.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      5L -> "added", 4L -> "unchanged")) // NULL text: present+equal → unchanged
  }

  // ----------------------------------- B33: source freshness

  test("freshness: ok/warn/error per group, all-NULL timestamps alarm") {
    val asOf = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    val df = Seq(
      ("fresh", java.sql.Timestamp.valueOf("2024-06-01 11:30:00")),
      ("stale", java.sql.Timestamp.valueOf("2024-06-01 06:00:00")),
      ("dead", java.sql.Timestamp.valueOf("2024-05-25 00:00:00")),
      ("silent", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("src", "ts")
    val out = graft.model.Freshness.check(df, "ts", "src",
      lit("2024-06-01 12:00:00").cast("timestamp"),
      warnAfterS = 3600L, errorAfterS = 86400L)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map("fresh" -> "ok", "stale" -> "warn",
      "dead" -> "error", "silent" -> "error"))
  }

  // ------------------------------------- C58: corpus health report

  test("corpus report: cross-source duplicate counted for both sources") {
    val df = Seq(
      (1L, "same text", "en", "srcA"),
      (2L, "same text", "de", "srcB"),   // exact copy ACROSS sources
      (3L, "unique alpha content", "en", "srcA"),
      (4L, "unique beta content here", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusStats.corpusReport(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6), r.getString(7)))
      .toMap
    // srcA: 3 docs, 2+3+4=9 tokens, 1 dup doc, 1 lang, dominant en
    assert(out("srcA") == ((3L, 9L, 1L, 1L, "en")))
    // srcB's single doc IS a dup (its copy lives in srcA)
    assert(out("srcB") == ((1L, 2L, 1L, 1L, "de")))
  }

  test("corpus report: NULL-source docs keep their own report row") {
    val df = Seq(
      (1L, "a b", "en", "srcA"),
      (2L, "c d e", "en", null.asInstanceOf[String]),
      (3L, "f", "de", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusStats.corpusReport(df)
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getString(7))).toMap
    assert(out(Some("srcA")) == ((1L, 2L, "en")))
    // the unattributed bucket is VISIBLE, not silently dropped
    assert(out(None) == ((2L, 4L, "de"))) // tie 1-1 → lexicographic min
  }

  test("corpus report: NULL-text docs carry no duplicate evidence") {
    val df = Seq(
      (1L, null.asInstanceOf[String], "en", "srcA"),
      (2L, null.asInstanceOf[String], "en", "srcA"), // NOT copies of each other
      (3L, "real text body", "en", "srcA"),
      (4L, "real text body", "en", "srcA")) // genuine exact pair
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusStats.corpusReport(df).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 4L) // all docs counted
    assert(out.head.getLong(4) == 2L) // only the real-text pair is dup
  }

  test("corpus report: dominant language ties break lexicographically") {
    val df = Seq(
      (1L, "x", "en", "s"), (2L, "y", "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusStats.corpusReport(df).collect().head
    assert(out.getString(7) == "de") // 1 vs 1 → lexicographic min
    assert(out.getLong(6) == 2L)
  }

  test("corpus report: skewSafe output identical, incl. NULL text/source") {
    val df = Seq(
      (1L, "same text", "en", "srcA"),
      (2L, "same text", "de", "srcB"),
      (3L, null.asInstanceOf[String], "en", "srcA"),
      (4L, null.asInstanceOf[String], "en", null.asInstanceOf[String]),
      (5L, "unique body", "de", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang", "source")
    val cols = Seq("source", "n_docs", "total_tokens", "n_dup_docs",
      "n_langs", "dominant_lang").map(col)
    val plain = CorpusStats.corpusReport(df)
      .select(cols: _*).collect().map(_.toSeq).toSet
    val safe = CorpusStats.corpusReport(df, skewSafe = true)
      .select(cols: _*).collect().map(_.toSeq).toSet
    assert(plain == safe)
  }

  // ------------------------------- C59: deterministic negative sampling

  test("negative samples: deterministic, never the positive, always in corpus") {
    val corpus = Seq.tabulate(50)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 7L), (2L, 13L)).toDF("query_id", "pos_id")
    val run1 = Retrieval.negativeSamples(pairs, corpus,
      "query_id", "pos_id", "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val run2 = Retrieval.negativeSamples(pairs, corpus,
      "query_id", "pos_id", "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(run1.nonEmpty)                       // guards the foralls below
    assert(run1.toSet == run2.toSet)            // reproducible, no RNG state
    assert(run1.forall { case (_, p, _, n) => n != p })
    assert(run1.forall { case (_, _, _, n) => n >= 0 && n < 50 })
    val perPair = run1.groupBy(t => (t._1, t._2)).view.mapValues(_.length)
    assert(perPair.values.forall(_ <= 4))       // up to k after discards
  }

  test("negative samples: empty corpus yields empty result") {
    val corpus = Seq((1L, "x")).toDF("doc_id", "text").limit(0)
    val pairs = Seq((1L, 7L)).toDF("query_id", "pos_id")
    assert(Retrieval.negativeSamples(pairs, corpus,
      "query_id", "pos_id", "doc_id").count() == 0)
  }

  // ------------------------------------- C52: incremental near-dup

  test("incremental near-dup: new batch vs corpus signature index only") {
    val near = "the quick brown fox jumps over the lazy dog again and again today"
    val nearCopy = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val far = "completely unrelated content talking about spark query engines at scale"
    val corpus = Seq((1L, near), (2L, far)).toDF("doc_id", "text")
    val corpusSigs = Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 8)
    val batch = Seq(
      (10L, nearCopy),          // near-dup of corpus doc 1
      (11L, "fresh novel writing with entirely different vocabulary choices"),
      (12L, "xy")               // too short for any shingle
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(batch, corpusSigs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(out.size == 3)                  // one row per new doc, incl. short
    assert(out(10L) == ((true, Some(1L)))) // matched to its corpus original
    assert(out(11L) == ((false, None)))
    assert(out(12L) == ((false, None)))
  }

  test("incremental near-dup: corpus never pairs with itself") {
    // two identical docs in the CORPUS must produce no output at all for
    // an unrelated batch — the operator compares batch×corpus only
    val dup = "same corpus text repeated verbatim in two corpus documents here"
    val corpusSigs = Dedup.minHashSignatures(
      Seq((1L, dup), (2L, dup)).toDF("doc_id", "text"), "doc_id", "text", 3, 8)
    val batch = Seq((10L, "entirely different new material")).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(batch, corpusSigs, "doc_id", "text")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L))
    assert(!out.head.getBoolean(1))
  }

  test("incremental near-dup: best match is highest agreement, ties to smaller id") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    // corpus docs 1 and 2 are identical → both agree 8/8 with the copy;
    // the deterministic winner is the smaller id
    val corpusSigs = Dedup.minHashSignatures(
      Seq((2L, text), (1L, text)).toDF("doc_id", "text"), "doc_id", "text", 3, 8)
    val out = Dedup.incrementalNearDup(
      Seq((10L, text)).toDF("doc_id", "text"), corpusSigs, "doc_id", "text")
      .collect().head
    assert(out.getBoolean(1) && out.getLong(2) == 1L && out.getInt(3) == 8)
  }

  // ------------------------------------- C54: count-min sketch

  test("count-min: estimates equal exact counts when width avoids collisions") {
    val toks = Seq.fill(5)("apple") ++ Seq.fill(3)("banana") ++ Seq("cherry")
    val df = toks.toDF("tok")
    val sketch = Sketches.countMinBuild(df, "tok", d = 4, w = 4096)
    val est = Sketches.countMinEstimate(sketch,
      Seq("apple", "banana", "cherry", "durian").toDF("tok"), "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 tokens into 4096 cells: no collisions → exact; durian unseen → 0
    assert(est == Map("apple" -> 5L, "banana" -> 3L, "cherry" -> 1L,
      "durian" -> 0L))
  }

  test("count-min: never undercounts, even with forced collisions") {
    val words = (0 until 50).map(i => s"w$i")
    val df = words.flatMap(t => Seq.fill((t.drop(1).toInt % 7) + 1)(t)).toDF("tok")
    val exact = df.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w=8: heavy collisions guaranteed; the CM bound is one-sided
    val sketch = Sketches.countMinBuild(df, "tok", d = 3, w = 8)
    val est = Sketches.countMinEstimate(sketch, words.toDF("tok"), "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach(t => assert(est(t) >= exact(t),
      s"$t: est ${est(t)} < exact ${exact(t)}"))
  }

  test("count-min: sketch of a union equals cell-wise sum of sketches") {
    val a = Seq("x", "y", "x").toDF("tok")
    val b = Seq("y", "z").toDF("tok")
    val merged = Sketches.countMinBuild(a.union(b), "tok", 4, 64)
      .cells.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val summed = (Sketches.countMinBuild(a, "tok", 4, 64).cells.collect() ++
      Sketches.countMinBuild(b, "tok", 4, 64).cells.collect())
      .groupBy(r => (r.getInt(0), r.getLong(1)))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(merged == summed) // commutative cell-add: THE distributed merge
  }

  test("count-min: weighted build sums weights instead of occurrences") {
    val df = Seq(("x", 10L), ("x", 5L), ("y", 2L)).toDF("tok", "wt")
    val sketch = Sketches.countMinBuild(df, "tok", 2, 256, Some("wt"))
    val est = Sketches.countMinEstimate(sketch,
      Seq("x", "y").toDF("tok"), "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("x" -> 15L, "y" -> 2L))
  }

  // ---------------------- C57: span-level duplicate removal

  test("span removal keep-first: first occurrence survives, later ones cut") {
    val df = Seq(
      (1L, "a b c d e f"),   // holds the FIRST "b c d" occurrence
      (2L, "z b c d q"),     // its "b c d" is second → removed
      (3L, "x y")            // no windows at all
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((6L, 0L, "a b c d e f")))
    assert(out(2L) == ((5L, 3L, "z q")))
    assert(out(3L) == ((2L, 0L, "x y")))
  }

  test("span removal aggressive mode purges every duplicated occurrence") {
    val df = Seq((1L, "a b c d e"), (2L, "z b c d q")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", 3,
      keepFirst = false)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "a e" && out(2L) == "z q") // both sides lose "b c d"
  }

  test("span removal: fully-duplicated doc empties but still appears") {
    val df = Seq((1L, "p q r"), (2L, "p q r")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((0L, "p q r"))) // the kept first occurrence
    assert(out(2L) == ((3L, "")))      // wholly removed, row remains
  }

  // ------------------------- C56: hashed linear quality scoring

  test("quality model: uniform weights give exact logit, feature counts right") {
    val df = Seq((1L, "a b"), (2L, "x y z"), (3L, "")).toDF("doc_id", "text")
    // every bucket weighs exactly 1.0 → logit must be exactly 1.0
    // independent of which buckets the features hash into
    val uniform = spark.range(64)
      .selectExpr("id as bucket", "CAST(1000000 AS LONG) as w_scaled")
    val out = QualityModel.score(df, "doc_id", "text", uniform, 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((3L, Some(1.0))))  // 2 unigrams + 1 bigram
    assert(out(2L) == ((5L, Some(1.0))))  // 3 unigrams + 2 bigrams
    assert(out(3L) == ((0L, None)))       // no features → NULL logit
  }

  test("quality model: sparse weight tables treat missing buckets as zero") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val empty = spark.range(0).selectExpr("id as bucket", "id as w_scaled")
    val out = QualityModel.score(df, "doc_id", "text", empty, 64)
      .collect().head
    assert(out.getLong(1) == 7L && out.getLong(2) == 0L && out.getDouble(3) == 0.0)
  }

  test("quality model: unigram-only mode counts tokens exactly") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val w = QualityModel.hashWeights(spark, 32)
    val out = QualityModel.score(df, "doc_id", "text", w, 32, useBigrams = false)
      .collect().head
    assert(out.getLong(1) == 3L)
  }

  test("quality model: hashWeights is deterministic and centered") {
    val w = QualityModel.hashWeights(spark, 256).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w2 = QualityModel.hashWeights(spark, 256).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == w2 && w.size == 256)
    assert(w.values.forall(v => v > -8388608L && v < 8388608L))
  }

  // ---------------------------------- C55: asymmetric containment

  test("containment: a short doc quoted inside a long one scores 1.0 vs low jaccard") {
    val quoted = "alpha beta gamma delta"
    val long = s"intro words first then $quoted and then much more material " +
      "follows with plenty of additional distinct vocabulary to dilute overlap"
    val df = Seq((1L, quoted), (2L, long)).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(df, "doc_id", "text", 2).collect().head
    assert(c.getLong(0) == 1L && c.getLong(1) == 2L)
    assert(c.getDouble(5) == 1.0) // every 2-shingle of the quote is in the long doc
    assert(c.getDouble(6) < 0.3)  // but the long doc is NOT contained in the quote
    val j = Dedup.jaccardPairs(df, "doc_id", "text", 2).collect().head
    assert(j.getDouble(4) < 0.3)  // resemblance alone would miss this pair
  }

  test("containment: DF cap applies to numerator and denominators consistently") {
    // one shingle shared by every doc (boilerplate) + per-doc unique ones;
    // cap 1 removes the hot shingle from inter AND sizes, so containment
    // can never exceed 1.0 or count boilerplate as contained content
    val df = Seq(
      (1L, "common x1 y1"), (2L, "common x2 y2"), (3L, "common x3 y3"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text", 1, maxShingleDf = 1)
      .collect()
    assert(out.forall(r => r.getDouble(5) <= 1.0 && r.getDouble(6) <= 1.0))
    assert(out.forall(_.getLong(2) == 0L) || out.isEmpty) // no shared non-hot shingle
  }

  // ------------------------------------------------- C51: SemDeDup

  test("semDedup: exact copy pruned (higher id), singleton kept, all rows out") {
    val base = Array.tabulate(8)(i => math.sin(i * 1.7 + 1).toFloat)
    val other = Array.tabulate(8)(i => math.cos(i * 2.3).toFloat)
    val df = Seq(
      (1L, base), (2L, base),   // identical pair: equal csim → id breaks tie
      (3L, other)               // different direction, likely another cell
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, "vec_id", "embedding",
      numCells = 4, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out.size == 3)
    assert(out(1L) && !out(2L)) // lower id survives an identical pair
    // vec 3 is far from the pair (different direction), so whether or
    // not it lands in their cell it is below threshold → kept
    assert(out(3L))
  }

  test("semDedup: below-threshold cell-mates all survive") {
    // near-orthogonal vectors: nothing reaches a 0.9 threshold
    val df = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, "vec_id", "embedding",
      numCells = 2, threshold = 0.9).collect()
    assert(out.length == 4 && out.forall(_.getBoolean(3)))
  }

  test("semDedup: oversized cells are exempted with bounded=true, not erased") {
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val df = Seq.tabulate(6)(i => (i.toLong, v)).toDF("vec_id", "embedding")
    // all six identical → one cell of 6 > cap 3 → pruning skipped, but
    // every row still comes back, flagged, so a kept=false filter can't
    // silently retain the junk spike without a signal
    val out = Similarity.semDedup(df, "vec_id", "embedding",
      numCells = 4, threshold = 0.9, maxCellSize = 3).collect()
    assert(out.length == 6)
    assert(out.forall(r => r.getBoolean(3) && r.getBoolean(4))) // kept, bounded
    // same corpus without the cap: pruning applies, nothing bounded
    val uncapped = Similarity.semDedup(df, "vec_id", "embedding",
      numCells = 4, threshold = 0.9).collect()
    assert(uncapped.count(r => !r.getBoolean(3)) == 5)
    assert(uncapped.forall(r => !r.getBoolean(4)))
  }

  test("semDedup: empty corpus short-circuits before centroid literals") {
    val df = Seq((1L, Array(1f, 2f))).toDF("vec_id", "embedding").limit(0)
    assert(Similarity.semDedup(df, "vec_id", "embedding", 4, 0.9).count() == 0)
  }

  // ---------------- C92: DSIR-style importance scoring (learned contrast)

  test("importanceScore: target-like docs rank above off-target docs") {
    val df = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta alpha", true),
      (3L, "gamma delta gamma delta", false),
      (4L, "alpha beta gamma delta", false), // mixed
      (5L, "", false), (6L, null.asInstanceOf[String], false))
      .toDF("doc_id", "text", "is_en")
    val out = QualityModel.importanceScore(df, "doc_id", "text",
      col("is_en"), numBuckets = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    // target vocabulary scores positive-ish, off-target negative-ish,
    // the mixed doc in between; empty/null docs carry no judgment
    val s = (id: Long) => out(id)._2.get
    assert(s(1L) > s(3L))
    assert(s(4L) > s(3L) && s(4L) < s(1L))
    assert(out(5L) == ((0L, None)) && out(6L) == ((0L, None)))
  }

  test("importanceScore: NULL target flag counts as non-target") {
    val df = Seq(
      (1L, "p q", java.lang.Boolean.TRUE),
      (2L, "p q", null.asInstanceOf[java.lang.Boolean]),
      (3L, "p q", java.lang.Boolean.FALSE))
      .toDF("doc_id", "text", "flag")
    val out = QualityModel.importanceScore(df, "doc_id", "text",
      col("flag"), numBuckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // identical text → identical scores; NULL behaves exactly as false
    assert(out(2L) == out(3L) && out(1L) == out(2L))
  }

  // ------------------------- C89: inverted index (df window + caps)

  test("invertedIndex: df window cuts hapax and stopword-grade terms") {
    val df = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog ran"),
      (4L, "the unique")).toDF("doc_id", "text")
    // 'the' df=4 > maxDf 3 dropped; 'unique'/'sat'/'dog' df=1 < minDf 2
    val out = Retrieval.invertedIndex(df, "doc_id", "text",
      minDf = 2, maxDf = 3, maxPostings = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.map(_._1) == Set("cat", "ran"))
    assert(out == Set(("cat", 2L), ("ran", 2L)))
  }

  test("invertedIndex: postings rank by tf desc, ties to smaller doc, capped") {
    val df = Seq(
      (5L, "w w w"), (1L, "w w"), (2L, "w w"), (9L, "w"))
      .toDF("doc_id", "text")
    val out = Retrieval.invertedIndex(df, "doc_id", "text",
      minDf = 1, maxDf = 100, maxPostings = 3)
      .collect().map(r => (r.getInt(2), r.getLong(3), r.getLong(4)))
    // rank 1: doc 5 (tf 3); ranks 2-3: docs 1, 2 (tf 2, id asc); doc 9
    // (tf 1) falls off the 3-posting cap
    assert(out.toSeq.sortBy(_._1) ==
      Seq((1, 5L, 3L), (2, 1L, 2L), (3, 2L, 2L)))
  }

  test("profileColumns: typed min/max, exact ndv, NULL accounting") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None),
      (Some(3L), Some("a")), (None, Some("a"))
    ).toDF("k", "s")
    val out = CorpusStats.profileColumns(df, Seq("k", "s"), "t.")
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("t.k"); val s = out("t.s")
    assert(k.getLong(1) == 4L && k.getLong(2) == 1L) // n_rows, n_nulls
    assert(k.getDouble(3) == 0.25 && k.getLong(4) == 2L) // null_frac, ndv
    assert(k.getDouble(5) == 1.0 && k.getDouble(6) == 3.0) // min/max_num
    assert(k.isNullAt(7) && k.isNullAt(8)) // numeric col: no string stats
    assert(s.getLong(2) == 1L && s.getLong(4) == 2L)
    assert(s.isNullAt(5) && s.isNullAt(6))
    assert(s.getString(7) == "a" && s.getString(8) == "b")
    // unsupported type and unknown column fail loudly
    val ts = Seq((1L, new java.sql.Timestamp(0L))).toDF("k", "ts")
    assertThrows[IllegalArgumentException](
      CorpusStats.profileColumns(ts, Seq("ts")))
    assertThrows[IllegalArgumentException](
      CorpusStats.profileColumns(df, Seq("nope")))
  }

  test("profileColumns: wide tables batch into bounded Expand passes; approxNdv drops Expand") {
    import org.apache.spark.sql.functions._
    // 50-column table: the shape the single-pass Expand multiplied by 51
    val nCols = 50
    val base = spark.range(200).toDF("id")
    val wide = (0 until nCols).foldLeft(base) { (d, i) =>
      d.withColumn(s"c$i", (col("id") * (i + 1)) % 17)
    }
    val cols = (0 until nCols).map(i => s"c$i")

    def expandFactors(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.ExpandExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      // AQE wraps each stage in AdaptiveSparkPlanExec, whose `children`
      // is empty — unwrap recursively or collect() sees nothing.
      def walk(p: SparkPlan): Seq[Int] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case e: ExpandExec => e.projections.size +: e.children.flatMap(walk)
        case other => other.children.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan)
    }

    // default batching: every Expand bounded at batch+1 = 9, never 51
    val batched = CorpusStats.profileColumns(wide, cols, "w.")
    assert(expandFactors(batched).nonEmpty &&
      expandFactors(batched).forall(_ <= 9),
      s"batched Expand factors must be <= 9: ${expandFactors(batched)}")
    // monolithic opt-out reproduces the unbatched plan (factor 51)
    val mono = CorpusStats.profileColumns(wide, cols, "w.", maxColsPerPass = nCols)
    assert(expandFactors(mono).exists(_ == nCols + 1))
    // identical results: batching is a pure plan change
    val a = batched.orderBy("col_name").collect().map(_.toSeq)
    val b = mono.orderBy("col_name").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)

    // approxNdv: no Expand at all (plain aggregate), ndv within HLL error
    val approx = CorpusStats.profileColumns(wide, cols, "w.", approxNdv = true)
    assert(expandFactors(approx).isEmpty,
      "approxNdv profile must plan without Expand")
    val exactNdv = a.map(r => r.head -> r(4).asInstanceOf[Long]).toMap
    approx.orderBy("col_name").collect().foreach { r =>
      val e = exactNdv(r.getString(0)).toDouble
      assert(math.abs(r.getLong(4) - e) <= math.max(1.0, 0.05 * e),
        s"approx ndv for ${r.getString(0)}: ${r.getLong(4)} vs exact $e")
    }
  }

  test("valueHistogram: bin placement, edges, degenerate constant column") {
    // 8 values in [0, 8], 4 bins of width 2; 8.0 clamps into the last bin
    val df = Seq(0.0, 0.5, 1.9, 2.0, 3.9, 4.0, 7.9, 8.0).toDF("x")
    val out = CorpusStats.valueHistogram(df, "x", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 0.0, 2.0, 3L), (1L, 2.0, 4.0, 2L),
      (2L, 4.0, 6.0, 1L), (3L, 6.0, 8.0, 2L)))
    // bin counts are a partition of the non-null rows
    assert(out.map(_._4).sum == 8L)
    // constant column: one bin covering the point, no division blow-up
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    val c = CorpusStats.valueHistogram(const, "x", 4).collect()
    assert(c.length == 1 && c(0).getLong(0) == 0L && c(0).getLong(3) == 3L)
    // NULLs carry no distribution info
    val withNull = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    assert(CorpusStats.valueHistogram(withNull, "x", 2)
      .agg(sum("n")).collect()(0).getLong(0) == 2L)
  }
}
