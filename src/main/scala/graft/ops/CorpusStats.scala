package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level distribution analytics for mixture design: how similar
  * are the token distributions of two sources? A high overlap between
  * sources means adding both to the mix buys less diversity than their
  * sizes suggest.
  */
object CorpusStats {

  /** Pairwise token co-occurrence with integer-exact LIFT — the
    * PMI-style association signal for corpus audits (collocations,
    * template phrases, topic clumps), log-free so it hash-matches
    * across engines: for terms a, b with document frequencies c_a, c_b
    * and co-document count c_ab over N docs,
    *   lift = P(a,b) / (P(a)·P(b)) = N·c_ab / (c_a·c_b),
    * emitted as the scaled long
    *   lift_scaled = ((c_ab·scale div c_a) · N) div c_b.
    * lift is exp(PMI) — the same ORDER as PMI, no libm ln whose last
    * ulp differs per platform ([[LangModel]]'s reasoning). The two
    * floor divisions compose in this exact sequence on both engines;
    * headroom: c_ab·scale < 2^63 and N·scale < 2^63 — at the default
    * 1e6 scale that is 9.2e12 docs, loud under ANSI beyond.
    *
    * Scale shape: the quadratic pair space is bounded BEFORE it exists —
    * the vocabulary is cut to the `vocabSize` most document-frequent
    * terms by ONE bounded topk_by_score aggregate (each map task ships
    * ≤ vocabSize terms; ties to the lexicographically smaller term),
    * broadcast back, so the per-doc pair fan-out is ≤ vocabSize²/2, a
    * CONSTANT per doc — never vocabulary². Presence is distinct
    * (doc, term) — within-doc repetition carries no co-occurrence
    * evidence. One doc-keyed self-join builds pairs, one (a, b)-keyed
    * count absorbs hot pairs map-side; `minPairDocs` drops
    * coincidence-grade pairs. N is a 1-scalar driver count.
    *
    * Output: term_a, term_b (a < b), n_a, n_b, n_ab, lift_scaled. */
  def cooccurrenceLift(
      docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 1000, minPairDocs: Long = 2L,
      scale: Long = 1000000L): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    require(minPairDocs >= 1L, "minPairDocs must be >= 1")
    require(scale > 0L, "scale must be positive")
    val n = docs.filter(col(idCol).isNotNull).count()
    val presence = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0).distinct()
    val termDf = presence.groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
    // bounded vocabulary cut: one single-group top-k aggregate, then a
    // broadcast join back onto the presence pairs
    val vocab = termDf
      .agg(call_function("topk_by_score",
        col("__df").cast("double"), col("term"), lit(vocabSize)).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.id").as("term"), col("e.score").cast("long").as("__df"))
    val p = presence.join(broadcast(vocab), Seq("term"))
    val pairs = p.select(col("__id"), col("term").as("term_a"),
        col("__df").as("n_a"))
      .join(p.select(col("__id"), col("term").as("term_b"),
        col("__df").as("n_b")), Seq("__id"))
      .filter(col("term_a") < col("term_b"))
      .groupBy(col("term_a"), col("term_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairDocs)
    pairs.select(col("term_a"), col("term_b"), col("n_a"), col("n_b"),
      col("n_ab"),
      expr(s"(((n_ab * ${scale}L) div n_a) * ${n}L) div n_b")
        .as("lift_scaled"))
  }

  /** Per-document shingle novelty: the fraction of a document's
    * distinct n-gram shingles whose FIRST occurrence (smallest doc id)
    * is this document — "how much new content does this doc add to the
    * corpus", the dedup-lite ordering signal curation pipelines rank on
    * (a near-copy of earlier material scores ~0 without any pair
    * enumeration).
    *
    * Scale shape: one distinct (id, shingle) explode, ONE
    * shingle-partitioned window computing the per-shingle min id (the
    * same hash partitioning a min-aggregate would need, but without a
    * second shuffle consumer re-deriving the exploded frame for the
    * join back — the [[Dedup.boundBuckets]] trick), one id-keyed
    * count. Exact integer counts and one per-row IEEE division, so the
    * score itself is oracle-hashable.
    *
    * Docs too short for any shingle get n_shingles 0 and a NULL novelty
    * (no content to judge — callers decide the policy).
    *
    * Output: idCol, n_shingles, n_novel, novelty. */
  def shingleNovelty(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val sh = Dedup.shingles(df, idCol, textCol, n)
    val perDoc = sh
      .withColumn("__first",
        min(col(idCol)).over(Window.partitionBy(col("shingle"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L))
          .as("n_novel"))
    df.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles").cast("double"))
          .as("novelty"))
  }

  /** Per-source corpus health report — the one-table answer to "what
    * is in this corpus and which sources need attention" a curation
    * team refreshes after every ingest: volume (docs, tokens, exact
    * avg length), exact-duplicate exposure (docs whose normalized
    * fingerprint occurs more than once ANYWHERE in the corpus — cross-
    * source copies count for both sources, which is the point), and
    * language profile (distinct langs + dominant lang, ties broken
    * lexicographically so the report is deterministic).
    *
    * Scale shape: one map pass (fingerprint + token count), ONE
    * fingerprint-partitioned window for corpus-wide copy counts (the
    * [[shingleNovelty]] no-join-back shape), then ONE (source, lang)
    * aggregate — the single corpus-side reduction, whose exchange both
    * downstream branches (per-source totals, dominant lang) share via
    * exchange reuse; everything after operates on source×lang rows.
    * `skewSafe` swaps the copy-count window (all occurrences of one
    * fingerprint on one task) for a groupBy aggregate + join back —
    * map-side partials absorb a boilerplate fingerprint occurring 10^8
    * times and AQE can split the skewed join, at the cost of a second
    * exchange; output is IDENTICAL either way (the same contract as
    * [[graft.ops.Dedup.windowDupStats]]).
    * NULL sources or langs group as NULL — visible in the report,
    * never dropped (the final join is null-SAFE: a NULL-source bucket
    * still gets its row). NULL text has a NULL fingerprint = no content
    * evidence, so NULL-text docs never count toward n_dup_docs (they
    * are unjudgeable, not copies of each other — the same "NULL = no
    * evidence" rule as [[graft.ops.IngestPipeline]] and windowDupStats).
    *
    * Output: sourceCol, n_docs, total_tokens, avg_tokens, n_dup_docs,
    * dup_frac, n_langs, dominant_lang. */
  def corpusReport(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source", langCol: String = "lang",
      skewSafe: Boolean = false): DataFrame = {
    val base0 = df.select(col(sourceCol), col(langCol), col(idCol),
      TextOps.fingerprint(col(textCol)).as("__fp"),
      TextOps.tokenCount(col(textCol)).cast("long").as("__ntok"))
    val base =
      if (skewSafe)
        // LEFT join: a NULL fingerprint never equi-matches, but the doc
        // row must survive (it still counts toward n_docs; its __fpn is
        // only read behind an isNotNull guard, so NULL __fpn is fine).
        base0.join(
          base0.filter(col("__fp").isNotNull)
            .groupBy(col("__fp")).agg(count(lit(1)).as("__fpn")),
          Seq("__fp"), "left")
      else base0.withColumn("__fpn",
        count(lit(1)).over(Window.partitionBy(col("__fp"))))
    val perSL = base.groupBy(col(sourceCol), col(langCol)).agg(
      count(lit(1)).as("__nd"),
      sum(col("__ntok")).as("__tt"),
      sum(when(col("__fp").isNotNull && col("__fpn") > 1, 1L).otherwise(0L))
        .as("__ndup"))
    val perSource = perSL.groupBy(col(sourceCol)).agg(
      sum(col("__nd")).as("n_docs"),
      sum(col("__tt")).as("total_tokens"),
      sum(col("__ndup")).as("n_dup_docs"),
      count(when(col(langCol).isNotNull, lit(1))).as("n_langs"))
    val domLang = perSL
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(col("__nd").desc, col(langCol).asc_nulls_last)))
      .filter(col("__rn") === 1)
      .select(col(sourceCol).as("__dl_src"), col(langCol).as("dominant_lang"))
    perSource.join(domLang, perSource(sourceCol) <=> col("__dl_src"))
      .select(perSource(sourceCol), col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("avg_tokens"),
        col("n_dup_docs"),
        (col("n_dup_docs").cast("double") / col("n_docs").cast("double"))
          .as("dup_frac"),
        col("n_langs"), col("dominant_lang"))
  }

  /** Corpus snapshot diff — the bookkeeping between two ingest
    * versions: per document id, whether it was added, removed, changed
    * (normalized-content fingerprint differs), or unchanged. The
    * input to incremental re-processing (re-embed/re-score only
    * added+changed) and to audit trails ("what did this refresh do").
    *
    * Presence is tracked with explicit flags, not fingerprint
    * NULL-ness, so a document with NULL text still diffs correctly
    * (NULL fingerprints compare null-safely: NULL → NULL is
    * unchanged). Scale shape: two map passes (fingerprint), one
    * id-keyed full outer join — never content × content.
    *
    * Output: idCol, status ∈ {added, removed, changed, unchanged}. */
  def snapshotDiff(
      before: DataFrame, after: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val b = before.select(col(idCol),
      TextOps.fingerprint(col(textCol)).as("__fb"), lit(true).as("__pb"))
    val a = after.select(col(idCol),
      TextOps.fingerprint(col(textCol)).as("__fa"), lit(true).as("__pa"))
    b.join(a, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(!coalesce(col("__pb"), lit(false)), "added")
          .when(!coalesce(col("__pa"), lit(false)), "removed")
          .when(col("__fb") <=> col("__fa"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Pairwise histogram intersection of unigram distributions:
    * sum over token types of min(p_a, p_b), where p is the token's
    * share of its source's total occurrences. 1 = identical
    * distributions, 0 = disjoint vocabularies.
    *
    * Engine-portable: shares are exact long/long IEEE divisions, min is
    * exact, and the cross-type sum runs through the scaled-integer
    * reduction at 1e9 (shares are tiny; the default 1e-6 resolution
    * would floor most of the mass) — headroom: vocab·1e9 ≪ 2^63.
    *
    * Scale shape: one (source, token) aggregate, a token-keyed
    * self-join (linear in vocabulary × source pairs sharing the token,
    * never doc×doc), one tiny per-pair aggregate.
    *
    * Output: one row for EVERY source pair src_a < src_b (disjoint
    * vocabularies emit overlap = 0, not a missing row — callers build
    * the full pairwise matrix), overlap ∈ [0, 1]. */
  def sourceOverlap(
      df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("g"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    val shares = toks.groupBy(col("g"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("g"))).cast("double"))
    val a = shares.select(col("g").as("src_a"), col("tok"), col("p").as("pa"))
    val b = shares.select(col("g").as("src_b"), col("tok"), col("p").as("pb"))
    val overlaps = a.join(b, Seq("tok"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(graft.ExactAgg.dsumAt(least(col("pa"), col("pb")), 1e9)
        .as("overlap"))
    // every pair appears: sources are few, so the pair skeleton is tiny.
    // Built from the INPUT's sources, not the share table — a source
    // whose documents are all empty/whitespace has no token shares but
    // must still appear in the matrix (overlap 0 with everything), or
    // "one row for EVERY source pair" above would silently not hold.
    val gs = df.select(col(groupCol).as("g")).distinct()
    gs.select(col("g").as("src_a"))
      .crossJoin(gs.select(col("g").as("src_b")))
      .filter(col("src_a") < col("src_b"))
      .join(overlaps, Seq("src_a", "src_b"), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0.0)))
  }

  /** ANALYZE-style column profiling — the data-quality / optimizer-stats
    * pass every warehouse runs after ingest (dbt `source freshness`'s
    * sibling; Spark's own `ANALYZE TABLE ... FOR COLUMNS` re-expressed
    * as a queryable operator): per column, row count, NULL count and
    * fraction, EXACT distinct count, and typed min/max (numeric columns
    * report doubles, string columns report strings — the other pair is
    * NULL). Exactness contract: every statistic is a count, an exact
    * long, or a picked (never computed) value, so results hash-match
    * any engine; the one division (null_frac) is a two-long double
    * division, bit-identical under IEEE 754 on both sides.
    *
    * Scale shape: one aggregation pass per ≤`maxColsPerPass`-column
    * BATCH (Catalyst plans each batch's multi-distinct aggregate via
    * Expand: rows × (#distinct-aggs-in-batch + 1) flow through its
    * exchange), then the 1-row results explode into one row per column
    * (driver-free pivot). Batching is the wide-table guard: a single
    * 100-column pass would push rows × 101 through ONE exchange with
    * ~600 aggregation buffers per hash-map entry — batches bound the
    * Expand factor and the aggregate width at a constant, trading extra
    * column-pruned scans (parquet reads only each batch's columns, so
    * total I/O is unchanged). Exact NDV is the declared semantic;
    * `approxNdv = true` switches to approx_count_distinct (HLL±~2.3%),
    * which removes the Expand entirely — one plain aggregate, the right
    * mode at 100 TB profile cadence where exact NDV's shuffle is the
    * cost and ±2% NDV is fine (same trade q_approx_distinct documents;
    * approx results no longer hash-match other engines).
    *
    * Unsupported column types are rejected loudly — a silent cast would
    * profile a timestamp as its string form and report min/max that
    * depend on the session's formatting.
    *
    * Output: col_name, n_rows, n_nulls, null_frac, n_distinct,
    * min_num, max_num, min_str, max_str — one row per profiled column,
    * col_name prefixed with `prefix` (typically the table name). */
  def profileColumns(
      df: DataFrame, cols: Seq[String], prefix: String = "",
      maxColsPerPass: Int = 8, approxNdv: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types._
    require(cols.nonEmpty, "profileColumns: at least one column")
    require(maxColsPerPass >= 1, "profileColumns: maxColsPerPass >= 1")
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val kinds: Seq[(String, Boolean)] = cols.map { c =>
      byName.get(c) match {
        case Some(_: NumericType) => c -> true
        case Some(StringType) => c -> false
        case Some(t) => throw new IllegalArgumentException(
          s"profileColumns: unsupported type $t for column $c " +
            "(numeric and string only — cast explicitly to choose semantics)")
        case None => throw new IllegalArgumentException(
          s"profileColumns: no column $c in ${df.schema.fieldNames.mkString(", ")}")
      }
    }
    kinds.grouped(maxColsPerPass)
      .map(batch => profileBatch(df, batch, prefix, approxNdv))
      .reduce(_.unionByName(_))
  }

  /** One ≤maxColsPerPass aggregation pass of [[profileColumns]]. */
  private def profileBatch(
      df: DataFrame, kinds: Seq[(String, Boolean)], prefix: String,
      approxNdv: Boolean): DataFrame = {
    val aggs = kinds.flatMap { case (c, isNum) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (approxNdv) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__ndv_$c"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__minn_$c"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__maxn_$c"),
        (if (isNum) lit(null).cast("string") else min(col(c)))
          .as(s"__mins_$c"),
        (if (isNum) lit(null).cast("string") else max(col(c)))
          .as(s"__maxs_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    val rows = kinds.map { case (c, _) =>
      struct(
        lit(prefix + c).as("col_name"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__ndv_$c").as("n_distinct"),
        col(s"__minn_$c").as("min_num"),
        col(s"__maxn_$c").as("max_num"),
        col(s"__mins_$c").as("min_str"),
        col(s"__maxs_$c").as("max_str"))
    }
    one.select(col("__n_rows").as("n_rows"),
        explode(array(rows: _*)).as("__p"))
      .select(col("__p.col_name"), col("n_rows"), col("__p.n_nulls"),
        when(col("n_rows") > 0L,
          col("__p.n_nulls").cast("double") / col("n_rows").cast("double"))
          .as("null_frac"),
        col("__p.n_distinct"), col("__p.min_num"), col("__p.max_num"),
        col("__p.min_str"), col("__p.max_str"))
  }

  /** Equi-width histogram of a numeric column — the distribution half
    * of [[profileColumns]] (optimizer selectivity stats, quality-score
    * dashboards, quantile-trim sanity checks). `bins` buckets span
    * [min, max]; value→bin is
    * `least(floor((x − mn) · bins / (mx − mn)), bins − 1)` and the
    * reported bin edges re-derive from the same doubles — every
    * operation is a single IEEE-754 op in a fixed order, so bin
    * placement and edges hash-match any engine evaluating the same
    * expression shape (no libm, no accumulation). A constant column
    * (mx = mn) degenerates to one bin covering the point, guarded
    * before the division ever runs (ANSI discipline). NULLs carry no
    * distribution information and are counted by [[profileColumns]],
    * not here. Empty bins are absent (it is a GROUP BY, not a spine —
    * join [[graft.ops.EventAnalytics]]-style date spines for dense
    * axes).
    *
    * Scale shape: one 2-scalar aggregate (min/max), broadcast to a
    * map-only bin assignment, one bin-keyed count — hot bins absorb
    * map-side. Output: bin, lo, hi, n (lo/hi = bin edges, hi of the
    * last bin = mx exactly). */
  def valueHistogram(df: DataFrame, valCol: String, bins: Int): DataFrame = {
    require(bins >= 1, "valueHistogram: bins must be >= 1")
    val v = df.select(col(valCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val mm = v.agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    val width = col("__mx") - col("__mn")
    val bin = when(width === 0.0, 0L).otherwise(
      least(floor((col("__v") - col("__mn")) * lit(bins.toDouble) / width),
        lit((bins - 1).toDouble)).cast("long"))
    v.crossJoin(broadcast(mm))
      .groupBy(bin.as("bin"), col("__mn"), col("__mx"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (col("__mn") + col("bin").cast("double") *
          (col("__mx") - col("__mn")) / lit(bins.toDouble)).as("lo"),
        when(col("bin") === (bins - 1).toLong, col("__mx")).otherwise(
          col("__mn") + (col("bin") + 1L).cast("double") *
            (col("__mx") - col("__mn")) / lit(bins.toDouble)).as("hi"),
        col("n"))
  }
}
