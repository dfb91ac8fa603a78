package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text relevance retrieval over the corpus — the tooling a
  * curation pipeline uses to FIND things in 100 TB of text: retrieval-
  * based contamination auditing (score eval questions against the
  * training corpus), targeted quality sampling, and building retrieval
  * training sets (query → top-k positives).
  *
  * Ref behavior: reference/testing.py and polars_utils.py stop at exact
  * string predicates; ranked retrieval is part of the extended
  * LLM-pipeline surface (builder brief), not a reference port.
  */
object Retrieval {

  /** BM25 ranked retrieval with RATIONAL (pre-log) Robertson/Spärck
    * Jones idf: idf(t) = (N - df + 0.5) / (df + 0.5). Dropping the log
    * keeps every step — integer counts, IEEE divide/multiply, floor —
    * bit-identical across engines and partitionings (ln() is the one
    * BM25 term whose last-ulp value is libm-dependent), so scores are
    * exactly reproducible and oracle-hashable. The transform is
    * monotone in classic idf; rankings differ from log-BM25 only in how
    * hard rare terms dominate multi-term queries — acceptable for
    * corpus tooling, and documented so nobody mistakes it for
    * Lucene-compatible scoring.
    *
    * Per matched (query, doc, term):
    *   contrib = idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * dl/avgdl))
    * summed per doc as floor(contrib * 1e6) longs (exact,
    * order-independent — the [[graft.ExactAgg]] discipline). Headroom:
    * idf < 2N + 1 and the tf factor < k1 + 1 = 2.2, so a document's
    * summed scaled score is bounded by 2N · 2.2e6 · |matched query
    * terms|; against Long.MaxValue ≈ 9.2e18 that is safe while
    * N · |matched terms| ≲ 2·10^12 — ~10^12 docs for a 2-term query,
    * ~10^11 at 20 matched terms. Beyond that the per-(query, doc) sum
    * would overflow silently; keep 2N · 2.2e6 · |terms| < 2^63 (chunk
    * the query or shrink the scale factor).
    *
    * Scale shape: doc lengths are a pure map (no explode); the token
    * explode is pre-filtered by a BROADCAST semi-join on the query term
    * set, so only matching tokens reach the one (doc, term) aggregate —
    * at 100 TB the shuffle carries rows ∝ postings of the query terms,
    * not the corpus token count. Term df and the query fan-out are
    * broadcast joins (≤ query-term-set cardinality). Corpus constants
    * (N, avgdl) are a 2-scalar driver collect, same as
    * [[Curation]]'s bounds. Final ranking shuffles ≤ matched docs per
    * query.
    *
    * Output: query_id, rank (1-based), idCol, score_scaled (floor of
    * 1e6 × BM25-rational score — exact long), n_terms (matched query
    * terms). Ties break on smaller id. */
  def bm25(
      docs: DataFrame, queries: DataFrame,
      idCol: String, textCol: String,
      queryIdCol: String, queryTextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol),
      TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("dl"))
    // N and avgdl: exact longs, divided once driver-side (IEEE-exact on
    // every engine). Bounded 2-scalar collect.
    val Array(cs) = toks
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("tot")).collect()
    val nDocs = cs.getLong(0)
    // Empty corpus, or non-empty with every text NULL (sum(dl) is then
    // NULL): no row ever reaches the scoring expressions (matched is
    // empty), so any finite avgdl yields the correct empty result with
    // the right schema — just avoid the 0/0 literal and the null unbox.
    val avgdl = if (nDocs == 0L || cs.isNullAt(1)) 1.0
      else cs.getLong(1).toDouble / nDocs.toDouble

    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(TextOps.tokens(col(queryTextCol))).as("term"))
      .filter(length(col("term")) > 0).distinct()
    val termSet = qterms.select(col("term")).distinct()

    val matched = toks
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .join(broadcast(termSet), Seq("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = matched.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))

    // Parenthesization mirrors the DuckDB oracle token-for-token: each
    // intermediate is a single exactly-rounded IEEE op on identical
    // inputs, so the floor()ed scaled contribution is bit-identical.
    val idf = (lit(nDocs).cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfc = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / lit(avgdl))))
    val scored = matched
      .join(broadcast(dfT), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("contrib", floor((idf * tfc) * lit(1e6)).cast("long"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("contrib")).as("score_scaled"),
        count(lit(1)).as("n_terms"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("score_scaled").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol),
        col("score_scaled"), col("n_terms"))
  }

  /** Deterministic negative sampling for contrastive / retrieval
    * training sets: for each (query, positive) pair, draw k
    * pseudo-random corpus documents as negatives. Draw i targets
    * corpus id md5("neg:{query}:{positive}:{i}")[0:12] mod N — fully
    * reproducible across runs, engines, and partitionings (no RNG
    * state), which is what makes training-data builds auditable.
    *
    * Draws that hit the pair's own positive are discarded, and
    * coinciding draws dedupe, so a pair yields UP TO k negatives
    * (standard practice: with N ≫ k the shortfall is negligible; the
    * draw index rides along for exact-k resampling downstream).
    *
    * Contract: the corpus id space should be roughly dense 0..N−1 —
    * draws landing on a missing id are dropped by the join (rank-index
    * a sparse corpus first, e.g. via [[graft.ops.Bucketing]] ranks).
    * Scale shape: pairs explode ×k map-side, then ONE id-keyed join
    * against the corpus — negatives ∝ pairs×k, never pairs×corpus; the
    * N constant is a 1-scalar driver agg.
    *
    * Output: queryIdCol, posIdCol, draw, neg (corpus idCol value). */
  def negativeSamples(
      pairs: DataFrame, corpus: DataFrame,
      queryIdCol: String, posIdCol: String, corpusIdCol: String,
      k: Int = 4): DataFrame = {
    require(k > 0, "k must be positive")
    val n = corpus.select(col(corpusIdCol)).distinct().count()
    if (n == 0) return pairs.select(col(queryIdCol), col(posIdCol))
      .limit(0).withColumn("draw", lit(0)).withColumn("neg", lit(0L))
    val drawn = pairs
      .select(col(queryIdCol), col(posIdCol),
        explode(array((0 until k).map(lit): _*)).as("draw"))
      .withColumn("neg",
        graft.functions.HashExprs.md5Mod(
          concat(lit("neg:"),
            col(queryIdCol).cast("string"), lit(":"),
            col(posIdCol).cast("string"), lit(":"),
            col("draw").cast("string")), 12, lit(n)))
      // null-SAFE discard: a NULL positive id equals no corpus id, so
      // its pair still draws k negatives instead of silently losing all
      .filter(!(col("neg") <=> col(posIdCol)))
      // coinciding draws keep the SMALLEST draw index — deterministic,
      // unlike dropDuplicates' arbitrary survivor
      .groupBy(col(queryIdCol), col(posIdCol), col("neg"))
      .agg(min(col("draw")).as("draw"))
    // distinct: mirrors the N computation (and the oracle) — duplicate
    // corpus ids must not duplicate output rows
    drawn.join(corpus.select(col(corpusIdCol).as("neg")).distinct(), Seq("neg"))
      .select(col(queryIdCol), col(posIdCol), col("draw"), col("neg"))
  }

  /** Inverted-index construction with a document-frequency window and
    * capped posting lists — the offline index build behind [[bm25]]:
    * term → (df, top `maxPostings` documents by term frequency). The df
    * window is the classic index-time vocabulary cut: `minDf` drops
    * hapax/noise terms (most of a web corpus's vocabulary is
    * singletons), `maxDf` drops stopword-grade terms whose posting
    * lists carry no ranking signal but dominate index size.
    *
    * Scale shape: ONE corpus pass — one (term, doc)-keyed count
    * (map-side partials absorb within-doc repetition), then one
    * term-keyed aggregate computing the df count AND the bounded
    * `topk_by_score` posting cap TOGETHER (the df window filters the
    * finished aggregate, so no second tokenize pass and no tf-side
    * self-join). Every map task ships ≤ maxPostings postings per term
    * through the final shuffle — a stopword that slips the df window
    * costs its cap, not its posting count (the
    * [[graft.ops.Dedup.boundBuckets]] discipline). tf rides the
    * aggregate as an exact double (tf ≪ 2^53); ranking ties break
    * toward the smaller doc id, as everywhere.
    *
    * Output: term, df, rank (1-based), idCol, tf. */
  def invertedIndex(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 2L, maxDf: Long = Long.MaxValue,
      maxPostings: Int = 10): DataFrame = {
    require(minDf >= 1L && maxDf >= minDf, "need 1 <= minDf <= maxDf")
    require(maxPostings > 0, "maxPostings must be positive")
    docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        call_function("topk_by_score",
          col("tf").cast("double"), col(idCol), lit(maxPostings)).as("tk"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
      .select(col("term"), col("df"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("term"), col("df"),
        (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as(idCol), col("e.score").cast("long").as("tf"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    * standard score-free hybrid-retrieval combiner (lexical BM25 +
    * dense ANN being the canonical pair): each input list contributes
    * `scale div (k0 + rank)` to every (query, id) it ranks, and results
    * order by the summed contribution. PURE LONG ARITHMETIC — integer
    * division, exact order-independent sums — so rankings are
    * bit-identical across engines and partitionings (a float 1/(k0+r)
    * formulation would drift with aggregation order). k0=60 is the
    * paper's constant; scale=1e12 keeps div quotients distinct for
    * ranks into the millions. Headroom: max contribution is
    * scale/(k0+1) ≈ 1.6e10, so ~5.6e8 lists all ranking one id first
    * would overflow the long sum — far beyond any ensemble, and ANSI
    * mode fails loudly rather than mis-ranking if it is ever reached.
    *
    * Scale shape: inputs are already top-k lists (per-query bounded by
    * construction), so the union, the (query, id)-keyed sum, and the
    * per-query ranking window all touch ≤ Σk rows per query — list
    * count × k, never corpus-shaped. Rows with a NULL id or NULL/
    * non-positive rank carry no ranking evidence and are dropped.
    *
    * Output: query_id, rank (fused, 1-based, ties to smaller id), id,
    * rrf_scaled (exact long), n_lists (lists that ranked the id). */
  def rrfFuse(
      lists: Seq[DataFrame], queryIdCol: String, idCol: String,
      rankCol: String, k0: Int = 60, topK: Int = 10,
      scale: Long = 1000000000000L): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k0 >= 0 && scale > 0, "k0 >= 0, scale > 0")
    val contribs = lists.map { l =>
      l.select(col(queryIdCol).as("query_id"), col(idCol).as("id"),
        col(rankCol).cast("long").as("__r"))
        .filter(col("id").isNotNull && col("__r") > 0)
        .select(col("query_id"), col("id"),
          // IntegralDivide (`div`), not `/`: Column `/` on longs is
          // DOUBLE division, and a truncated double quotient can land
          // one off the exact integer quotient
          call_function("div", lit(scale),
            lit(k0.toLong) + col("__r")).as("__c"))
    }.reduce(_ unionByName _)
    val fused = contribs
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("__c")).as("rrf_scaled"), count(lit(1)).as("n_lists"))
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_scaled").desc, col("id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("id"),
        col("rrf_scaled"), col("n_lists"))
  }
}
