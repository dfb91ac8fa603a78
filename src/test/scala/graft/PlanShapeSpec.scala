package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.CoreQueries

/** Mechanical plan-shape invariants: the performance properties PERF_NOTES
  * claims are asserted here so a regression (lost pushdown, broadcast
  * degrading to shuffle join, an operator growing an extra exchange)
  * fails CI instead of silently shipping.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "(?m)^.*Exchange".r.findAllIn(p).size

  test("q_filter_project pushes filters and prunes columns at the scan") {
    val p = plan(CoreQueries.queries("q_filter_project")(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("PushedFilters: [IsNotNull(l_quantity)"))
    // projection pruning: untouched columns never leave the scan
    assert(!p.contains("l_returnflag"))
    assert(!p.contains("l_comment"))
  }

  test("q_join_agg broadcasts the filtered dimension side") {
    val p = plan(CoreQueries.queries("q_join_agg")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_multi_join keeps all dimension joins broadcast") {
    val p = plan(CoreQueries.queries("q_multi_join")(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
  }

  test("single-split scans actually fan out (round-robin exchange present)") {
    // the ≤1-exchange asserts below also pass when fan-out silently
    // stops firing — this pins that it DOES fire on a one-split scan
    val p = plan(ops.Dedup.fanOut(Tables.load(spark, sfDir, "documents")))
    assert(p.contains("RoundRobinPartitioning"), p)
  }

  test("simhash plan never key-shuffles (round-robin fan-out only)") {
    val df = ops.Dedup.simHash(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text")
    val p = plan(df)
    assert(exchanges(p) <= 1, p)           // at most the adaptive fan-out
    assert(!p.contains("hashpartitioning"), p) // and it is never a key shuffle
  }

  test("minhash signatures never key-shuffle (round-robin fan-out only)") {
    val df = ops.Dedup.minHashSignatures(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text", 3, 8)
    val p = plan(df)
    assert(exchanges(p) <= 1, p)
    assert(!p.contains("hashpartitioning"), p)
  }

  test("bounded top-k runs as partial + final object aggregate") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val df = ops.Similarity.bruteForceTopK(
      e.filter(col("vec_id") < 3), e, "vec_id", "vec_id", "embedding", 5)
    val p = plan(df)
    assert(p.contains("topk_by_score"))
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2 ||
      "SortAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("exact aggregation combines map-side before its shuffle") {
    val p = plan(CoreQueries.queries("q_agg")(spark, sfDir))
    assert(p.contains("partial_sum"), p) // partial aggregate below the exchange
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    // exactly one key shuffle (agg) + one range exchange (final sort)
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("native vector arithmetic stays inside whole-stage codegen") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val scored = e.select(col("vec_id"),
      ops.Similarity.cosine(col("embedding"), col("embedding")).as("sim"))
      .filter(col("sim") > 0.5)
    val p = plan(scored)
    // the project/filter evaluating vec_cosine carries the `*(n)`
    // whole-stage-codegen marker — no CodegenFallback in the hot path
    val cosLine = p.linesIterator.find(_.contains("vec_cosine")).get
    assert(cosLine.trim.matches("^[+:\\-\\s]*\\*\\(\\d+\\).*"), p)
  }

  test("weighted sampling and rebalance are pure map filters (no shuffle)") {
    val d = Tables.load(spark, sfDir, "documents")
    val p = plan(ops.Sampling.weightedSample(d, "doc_id",
      least(col("n_chars").cast("double") / lit(500.0), lit(1.0))))
    assert(exchanges(p) == 0, p)
    val p2 = plan(ops.Sampling.rebalance(d, "doc_id", "lang",
      Map("en" -> 0.5, "zh" -> 0.5)))
    assert(exchanges(p2) == 0, p2)
  }

  test("embedding LSH dedup exchanges carry scalars, not vectors") {
    val e = Tables.load(spark, sfDir, "embeddings")
    // score-then-dedup: the dropDuplicates aggregate must never carry
    // the embedding vectors (first(va)/first(vb)) through its exchange
    val p1 = plan(ops.Similarity.nearDupPairs(e, "vec_id", "embedding", 0.9))
    assert(!p1.contains("first(va"), p1)
    assert(!p1.contains("first(vb"), p1)
    val p2 = plan(ops.Similarity.lshTopK(
      e.filter(col("vec_id") < 3), e, "vec_id", "vec_id", "embedding", 5))
    assert(!p2.contains("first(qv"), p2)
    assert(!p2.contains("first(cv"), p2)
  }

  test("q_scalar_subquery plans a genuine Catalyst ScalarSubquery") {
    val df = CoreQueries.queries("q_scalar_subquery")(spark, sfDir)
    // optimized plan carries scalar-subquery expressions; the executed
    // plan shows the physical Subquery node (may be a ReusedSubquery)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("scalar-subquery"), opt)
    val p = plan(df)
    assert(p.contains("Subquery"), p)
  }

  test("IVF cell assignment is a pure map (no key shuffle before the write)") {
    // the streaming index maintainer appends indexCells output per
    // micro-batch; a key shuffle here would serialize ingestion at scale
    val e = Tables.load(spark, sfDir, "embeddings")
    val df = ops.Similarity.indexCells(e, "vec_id", "embedding",
      ops.Similarity.hashCentroids(8, ops.Similarity.vecDim(e, "embedding")))
    val p = plan(df)
    assert(exchanges(p) <= 1, p)               // at most the adaptive fan-out
    assert(!p.contains("hashpartitioning"), p) // never a key shuffle
  }

  test("sequence packing: global prefix sum never single-partitions the data") {
    val df = ops.Dedup.fanOut(Tables.load(spark, sfDir, "documents"))
    val p = plan(ops.Curation.packSequences(
      df, "doc_id", ops.TextOps.tokenCount(col("text")), 128))
    // the bucket-offset side broadcasts back to the main flow
    assert(p.contains("BroadcastHashJoin"), p)
    // exactly ONE SinglePartition exchange: the numBuckets-row totals
    // window — the full corpus itself is never funneled to one partition
    assert("SinglePartition".r.findAllIn(p).size == 1, p)
    // the corpus-side running sum is a window PARTITIONED by bucket
    assert("Window".r.findAllIn(p).size == 2, p)
  }

  test("curriculum: global rank is two-level, never a single-partition window") {
    val df = ops.Dedup.fanOut(Tables.load(spark, sfDir, "documents"))
    val p = plan(ops.Curation.curriculum(
      df, "doc_id", ops.TextOps.tokenCount(col("text")).cast("long"), 4))
    assert(p.contains("BroadcastHashJoin"), p) // bucket offsets broadcast back
    // exactly ONE SinglePartition exchange: the numBuckets-row offsets
    // window — corpus rows rank inside per-bucket window partitions
    assert("SinglePartition".r.findAllIn(p).size == 1, p)
  }

  test("token budget: per-stratum running sum is two-level, never one task per stratum") {
    val df = ops.Dedup.fanOut(Tables.load(spark, sfDir, "documents"))
    val q = ops.Curation.tokenBudget(
      df.select(col("doc_id"), col("source"),
        ops.TextOps.qualityScore(col("text")).as("quality"), col("text")),
      "source", ops.TextOps.tokenCount(col("text")), 600L,
      Seq(col("quality").desc, col("doc_id")))
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin"), p) // bucket offsets broadcast back
    // Every corpus-row window (the ones ordered by the DESC priority)
    // must be partitioned by (stratum, __bucket) — a window partitioned
    // by stratum alone would funnel ~N/strata rows through one sorted
    // task at scale. The only stratum-alone window is the tiny
    // bucket-totals prefix (ordered by __bucket ASC over strata×buckets
    // aggregate rows).
    val specs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(p).toList
    val corpusSpecs = specs.filter(_.contains("DESC"))
    assert(corpusSpecs.nonEmpty, p)
    assert(corpusSpecs.forall(_.contains("__bucket")),
      s"corpus-row window must include the bucket in its partition spec:\n$p")
  }

  test("int8 quantization is a pure map — no exchange of any kind") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val p = plan(ops.Similarity.quantizeInt8(
      e.select(col("vec_id"), col("embedding")), "embedding"))
    assert(exchanges(p) == 0, p) // per-vector scale + bytes: map-side only
  }

  test("signature jaccard estimate touches only the signature table") {
    // production form: signatures are materialized once (the index) and
    // the estimate runs off the table on disk. A localCheckpoint would
    // make the no-re-derivation assert vacuous (the subtree physically
    // can't appear); a real parquet round-trip keeps it meaningful.
    val sigDir = java.nio.file.Files
      .createTempDirectory("graft_sig_idx_").toString
    ops.Dedup.minHashSignatures(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text", 3, 8)
      .write.mode("overwrite").parquet(sigDir)
    val sigs = spark.read.parquet(sigDir)
    val p = plan(ops.Dedup.jaccardEstimateFromSignatures(sigs, "doc_id"))
    assert(!p.contains("minhash_sig"), p) // no signature re-computation
    assert(!p.contains("CartesianProduct"), p)
    // contrast: the text-facing convenience overload DOES carry the
    // signature stage in-plan — pins that the assert above can fail
    val pText = plan(ops.Dedup.jaccardEstimate(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text"))
    assert(pText.contains("minhash_sig"), pText)
  }

  test("shingle novelty: first-occurrence is a window, not agg + re-join") {
    val df = ops.Dedup.fanOut(Tables.load(spark, sfDir, "documents"))
    val p = plan(ops.CorpusStats.shingleNovelty(df, "doc_id", "text", 3))
    // window form: the exploded shingle frame has ONE shuffle consumer;
    // an aggregate + join-back would re-derive the explode twice
    assert("windowspecdefinition".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("window dup stats: one window-hash shuffle consumer, no pair join") {
    val df = ops.Dedup.fanOut(Tables.load(spark, sfDir, "documents"))
    val p = plan(ops.Dedup.windowDupStats(df, "doc_id", "text", 5))
    // occurrence counting is the shingleNovelty window shape: the
    // exploded frame has ONE hash-partitioned consumer, never an
    // aggregate + join-back re-deriving the explode, and duplication is
    // counted (linear), never enumerated as pairs (quadratic)
    assert("windowspecdefinition".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bm25: corpus explode is broadcast-filtered before any aggregation") {
    import spark.implicits._
    val q = Seq((0, "hash join"), (1, "window agg")).toDF("query_id", "qtext")
    val p = plan(ops.Retrieval.bm25(
      ops.Dedup.fanOut(Tables.load(spark, sfDir, "documents")), q,
      "doc_id", "text", "query_id", "qtext"))
    // every join (term-set semi, df, query fan-out) is broadcast — the
    // only shuffles are the keyed aggregates and the per-query ranking
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("incremental near-dup: batch side broadcasts into the corpus band index") {
    val all = Tables.load(spark, sfDir, "documents")
    val corpusSigs = ops.Dedup.minHashSignatures(
      all.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", 3, 8)
    val p = plan(ops.Dedup.incrementalNearDup(
      all.filter(col("doc_id") % 5 === 0), corpusSigs, "doc_id", "text"))
    // the continuous-ingestion contract: the corpus band index is never
    // shuffled for the candidate join — the (small) batch broadcasts
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("count-min build: partial-aggregated, shuffle is sketch-sized") {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(explode(ops.TextOps.tokens(col("text"))).as("tok"))
    val p = plan(ops.Sketches.countMinBuild(toks, "tok").cells)
    // the combiner caps per-partition output at d×w cells, so the one
    // exchange carries sketch rows, never corpus token rows
    assert(p.contains("partial_sum"), p)
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("semDedup: pairwise work stays cell-partitioned, assignment is a map") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val p = plan(ops.Similarity.semDedup(e, "vec_id", "embedding", 8, 0.35))
    // centroids ride as literals: no join or shuffle computes the cell;
    // the self-join is an EQUI-join keyed on cell (broadcast at this SF,
    // cell-hash-partitioned when stats outgrow the broadcast threshold)
    // — never a cartesian product with the cosine as a filter
    assert(!p.contains("CartesianProduct"), p)
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[cell#".r
      .findFirstIn(p).nonEmpty, p)
  }

  test("native as-of join: two clustered exchanges, no union, no window") {
    val ev = Tables.load(spark, sfDir, "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val df = ops.TemporalJoins.asOfJoinNative(l, r, "user_id", "ts", "event_id")
    val p = plan(df)
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Union") && !p.contains("Window"), p)
    assert("hashpartitioning".r.findAllIn(p).size == 2, p) // one per side
    // the merge loop itself is whole-stage-codegen'd: after execution the
    // final adaptive plan's AsOfJoin line carries the `*(n)` marker (not
    // an interpreted hop between codegen'd stages)
    df.collect()
    val post = df.queryExecution.executedPlan.toString
    val asofLine = post.linesIterator.find(_.contains("AsOfJoin")).get
    assert(asofLine.trim.matches("^[+:\\-\\s]*\\*\\(\\d+\\).*"), post)
  }

  test("pq encode is a pure map: no shuffle beyond the adaptive fan-out") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val p = plan(ops.Similarity.pqEncode(e, "vec_id", "embedding", 4, 8))
    assert(exchanges(p) <= 1, p)               // at most the round-robin fan-out
    assert(!p.contains("hashpartitioning"), p) // never a key shuffle
    val pw = plan(ops.Similarity.pqEncodeWide(e, "vec_id", "embedding", 4, 8))
    assert(exchanges(pw) <= 1, pw)
    assert(!pw.contains("hashpartitioning"), pw)
  }

  test("pq ADC search: broadcast tables, bounded top-k, no cartesian") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val codes = ops.Similarity.pqEncode(e, "vec_id", "embedding", 4, 8)
    val df = ops.Similarity.pqSearch(codes, e.filter(col("vec_id") < 3),
      "vec_id", "vec_id", "embedding", 4, 8, 64, 5)
    val p = plan(df)
    // query distance tables ride a broadcast nested-loop (one row per
    // query, no key), never a CartesianProduct shuffle
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // ranking is the bounded aggregate, not a per-query sort window
    assert(p.contains("topk_by_score") && !p.contains("Window"), p)
  }

  test("pq ADC search, wide layout: reassembly aggregate gone from plan") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val codes = ops.Similarity.pqEncodeWide(e, "vec_id", "embedding", 4, 8)
    val df = ops.Similarity.pqSearchWide(codes, e.filter(col("vec_id") < 3),
      "vec_id", "vec_id", "embedding", 4, 8, 64, 5)
    val p = plan(df)
    // the production layout scores straight off the code scan: no
    // collect_list reassembly, no key shuffle before scoring — only the
    // one-row-per-query broadcast and the bounded top-k ranking
    assert(!p.contains("collect_list"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("topk_by_score") && !p.contains("Window"), p)
  }

  test("bloom build is one aggregate pass; probe joins only the bitmap row") {
    val d = Tables.load(spark, sfDir, "documents")
    val bf = ops.Sketches.bloomBuild(d, "text", 1 << 14, 5)
    val pb = plan(bf.bitmap)
    // partial + final bloom_build, single-partition exchange of one
    // numBits/64-long row — never a key shuffle of the corpus
    assert(pb.contains("bloom_build"), pb)
    assert(!pb.contains("hashpartitioning"), pb)
    val probe = ops.Sketches.bloomMightContain(bf, d.select(col("doc_id"),
      col("text")), "text")
    val pp = plan(probe)
    assert(pp.contains("BroadcastNestedLoopJoin"), pp)
    assert(!pp.contains("SortMergeJoin") && !pp.contains("CartesianProduct"), pp)
  }

  test("domain cap ships at most the cap per domain: aggregate, no window") {
    val d = Tables.load(spark, sfDir, "documents")
    val p = plan(ops.Curation.domainCap(d, "doc_id", "source",
      col("n_chars").cast("double"), 10))
    assert(p.contains("topk_by_score"), p)
    assert(!p.contains("Window"), p)
    // one key shuffle: the per-domain final aggregate
    assert("hashpartitioning".r.findAllIn(p).size <= 1, p)
  }

  test("kmeans: assignment is a map, sizes join broadcast — no sort-merge") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val p = plan(ops.Similarity.kmeans(e, "vec_id", "embedding",
      k = 4, lloydIters = 1))
    // the k-row cluster-size side broadcasts; rows are never sorted or
    // windowed to attach their cluster size
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
  }

  test("url canonicalization is a pure map: no exchange of any kind") {
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), concat(lit("https://www.Ex.COM/p?utm_a=1&id="),
        col("doc_id")).as("url"))
    val p = plan(ops.Curation.canonicalizeUrls(d, "url"))
    assert(exchanges(p) == 0, p)
    assert(!p.contains("Window") && !p.contains("Sort"), p)
  }

  test("z-value projection is a pure map; blocklist filter anti-broadcasts") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val p = plan(ops.ZOrder.withZValue(ev, "user_id", "ts_us", 8))
    // the stats collect happened driver-side; what remains is one
    // codegen'd projection over the scan
    assert(exchanges(p) == 0, p)
    import spark.implicits._
    val d = Tables.load(spark, sfDir, "documents")
    val bl = Seq("src1", "src3").toDF("domain")
    val pb = plan(ops.Curation.filterBlockedDomains(d, "source", bl, "domain"))
    assert(pb.contains("BroadcastHashJoin") && pb.contains("LeftAnti"), pb)
    assert(!pb.contains("SortMergeJoin"), pb)
  }

  test("rendezvous sharding is a pure map: no exchange, no window") {
    val d = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val p = plan(ops.Curation.rendezvousShard(d, "doc_id", 16))
    assert(exchanges(p) == 0, p)
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }

  test("label propagation round: aggregate argmax, never a per-node window") {
    // assert on the ROUND itself — the per-round checkpoint truncates
    // lineage, so the composed operator's final plan hides the argmax
    val e = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("u"), (col("doc_id") * 7 % 100).as("v"))
    val labels = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), col("doc_id").as("l"))
    val p = plan(ops.Graph.lpaRound(e, labels))
    assert(!p.contains("Window"), p)
    assert(p.contains("max("), p) // the struct-argmax aggregate
    // two key shuffles: (v, l) counts, then the per-node argmax
    assert("hashpartitioning".r.findAllIn(p).size <= 3, p)
  }
}
