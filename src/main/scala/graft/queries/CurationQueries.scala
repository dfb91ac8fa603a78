package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.ops.{Curation, Dedup, TextOps}

/** Corpus-curation operators (SURVEY.md §2 C36–C38) as driver-checkable
  * queries: boilerplate removal, leakage-safe splits, token-budget
  * selection. The DuckDB oracles re-derive unit segmentation, the
  * duplicate-cluster transitive closure, and the budget window
  * token-for-token, so these hash-match on full values.
  */
object CurationQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Dedup.fanOut(Tables.load(s, dir, "documents"))

  import LlmOpsQueries.{sqlNorm, sqlToks, qDedupMinhashCtesCapped}

  // --------------------------- C36: line/segment boilerplate removal
  // CCNet-style boilerplate strip: a unit occurring in >= MinDocs
  // distinct docs of the same source is dropped from every doc. The
  // synthetic docs carry no newlines, so the driver query uses
  // fixed-width token segments as the unit; the newline-unit path is
  // exercised on multi-line fixtures in CurationSpec.
  private val SegWidth = 5
  private val MinDocs = 3

  private def qBoilerplate(s: SparkSession, dir: String): DataFrame =
    Curation.removeBoilerplate(
      docs(s, dir), "doc_id", "source",
      Curation.segmentUnits(col("text"), SegWidth), MinDocs)
      .orderBy("doc_id")

  private val qBoilerplateSql =
    s"""WITH norm AS (
       |  SELECT doc_id, source, $sqlToks AS toks FROM documents),
       |seg AS (
       |  SELECT doc_id, source, CAST(i AS INTEGER) AS ord,
       |    array_to_string(toks[i*$SegWidth+1 : i*$SegWidth+$SegWidth], ' ') AS unit
       |  FROM norm, UNNEST(range(GREATEST(
       |    CAST(CEIL(len(toks) / $SegWidth.0) AS BIGINT), 1))) AS u(i)),
       |boiler AS (
       |  SELECT source, unit
       |  FROM (SELECT source, unit, COUNT(DISTINCT doc_id) AS ndocs
       |        FROM seg GROUP BY source, unit)
       |  WHERE ndocs >= $MinDocs),
       |kept AS (
       |  SELECT s.doc_id, s.ord, s.unit
       |  FROM seg s LEFT JOIN boiler b
       |    ON s.source = b.source AND s.unit = b.unit
       |  WHERE b.unit IS NULL),
       |clean AS (
       |  SELECT doc_id, string_agg(unit, ' ' ORDER BY ord) AS clean_text,
       |    COUNT(*) AS n_kept
       |  FROM kept GROUP BY doc_id),
       |totals AS (
       |  SELECT doc_id, source,
       |    GREATEST(CAST(CEIL(len(toks) / $SegWidth.0) AS INTEGER), 1) AS n_units
       |  FROM norm)
       |SELECT t.doc_id, t.source,
       |  COALESCE(c.clean_text, '') AS clean_text,
       |  CAST(t.n_units AS INTEGER) AS n_units,
       |  CAST(t.n_units - COALESCE(c.n_kept, 0) AS INTEGER) AS n_removed
       |FROM totals t LEFT JOIN clean c ON t.doc_id = c.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // ------------------------------- C37: leakage-safe train/val/test split
  // Split keyed on the MinHash duplicate-cluster canonical id, so
  // near-duplicate docs never straddle a split boundary. DuckDB
  // re-derives the full pipeline: shingles → minhash → bands → pairs →
  // recursive transitive closure → md5 bucket.
  private def qSplitLeaksafe(s: SparkSession, dir: String): DataFrame =
    Curation.leakSafeSplit(
      docs(s, dir), "doc_id",
      Dedup.minHashLsh(docs(s, dir), "doc_id", "text",
        LlmOpsQueries.ShingleN, LlmOpsQueries.NumHashes,
        LlmOpsQueries.BandSize))
      .orderBy("doc_id")

  /** MinHash pairs → recursive transitive closure → canonical cluster
    * per document — the shared cluster re-derivation behind the
    * leak-safe split AND the leak-safe k-fold (one definition, so the
    * two leakage guards can never disagree on a cluster). */
  private val leakClusterCtes = {
    val recursiveCtes =
      qDedupMinhashCtesCapped.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$recursiveCtes,
       |edges AS (
       |  SELECT a AS u, b AS v FROM pairs
       |  UNION SELECT b AS u, a AS v FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |clusters AS (
       |  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster
       |  FROM reach GROUP BY u),
       |assigned AS (
       |  SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)""".stripMargin
  }

  private val qSplitLeaksafeSql =
    s"""$leakClusterCtes
       |SELECT doc_id, cluster,
       |  CASE WHEN bkt < 80 THEN 'train'
       |       WHEN bkt < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, cluster,
       |        CAST('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 8)
       |             AS BIGINT) % 100 AS bkt
       |      FROM assigned)
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------- C75: leakage-safe k-fold CV
  private val NumFolds = 5

  private def qKfold(s: SparkSession, dir: String): DataFrame =
    Curation.leakSafeKFold(
      docs(s, dir), "doc_id",
      Dedup.duplicateClusters(
        Dedup.minHashLsh(docs(s, dir), "doc_id", "text",
          LlmOpsQueries.ShingleN, LlmOpsQueries.NumHashes,
          LlmOpsQueries.BandSize), "a", "b")
        .withColumnRenamed("a", "doc_id"),
      NumFolds)
      .orderBy("doc_id")

  private val qKfoldSql =
    s"""$leakClusterCtes
       |SELECT doc_id, cluster,
       |  CAST(CAST('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 8)
       |       AS BIGINT) % $NumFolds AS INTEGER) AS fold
       |FROM assigned
       |ORDER BY doc_id""".stripMargin

  // --------------------------------- C38: token-budget source mixing
  // Fill each source's slice of the training mix in quality order until
  // the token budget is exhausted. Priority is (quality points DESC,
  // doc_id) — a total order, so the kept prefix is engine-exact.
  private val Budget = 600L

  private def qTokenBudget(s: SparkSession, dir: String): DataFrame =
    Curation.tokenBudget(
      docs(s, dir).select(col("doc_id"), col("source"),
        TextOps.qualityScore(col("text")).as("quality"),
        col("text")),
      "source", TextOps.tokenCount(col("text")), Budget,
      Seq(col("quality").desc, col("doc_id")))
      .select(col("source"), col("doc_id"), col("quality"),
        col("n_tokens"), col("cum_tokens"))
      .orderBy("source", "doc_id")

  /** DuckDB twin of TextOps.qualityScore over a `text` column (shared
    * by the token-budget and full-pipeline oracles). */
  private val sqlQuality = {
    val stop = TextOps.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    val nTok = s"greatest(len($sqlToks), 1)"
    val stopRatio =
      s"CAST(len(list_intersect($sqlToks, [$stop])) AS DOUBLE) / CAST($nTok AS DOUBLE)"
    val avgLen =
      s"CAST(length(replace($sqlNorm, ' ', '')) AS DOUBLE) / CAST($nTok AS DOUBLE)"
    val punct =
      s"""CAST(len(regexp_extract_all(text, '[.,;:!?''"()\\-]')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE)"""
    s"""CAST(CASE WHEN CAST(len($sqlToks) AS DOUBLE) >= 10.0
       |       AND CAST(len($sqlToks) AS DOUBLE) <= 100000.0 THEN 4 ELSE 0 END
       | + CASE WHEN $avgLen >= 2.0 AND $avgLen <= 12.0 THEN 3 ELSE 0 END
       | + CASE WHEN $stopRatio >= 0.01 THEN 2 ELSE 0 END
       | + CASE WHEN $punct <= 0.2 THEN 1 ELSE 0 END AS DOUBLE) / 10.0""".stripMargin
  }

  private val qTokenBudgetSql = {
    val quality = sqlQuality
    s"""WITH scored AS (
       |  SELECT source, doc_id, $quality AS quality,
       |    CAST(len($sqlToks) AS BIGINT) AS n_tokens
       |  FROM documents),
       |windowed AS (
       |  SELECT source, doc_id, quality, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source
       |      ORDER BY quality DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |  FROM scored)
       |SELECT source, doc_id, quality, n_tokens,
       |  CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM windowed WHERE cum_tokens <= $Budget
       |ORDER BY source, doc_id""".stripMargin
  }

  // ------------------------------------- C41: concat-and-chunk packing
  // GPT-style sequence packing: docs laid end to end in doc_id order,
  // cut into 128-token training sequences. The engine computes the
  // global prefix sum as a two-level bucketed reduction (never a
  // single-partition window); the oracle is the plain global window it
  // must equal.
  private val SeqLen = 128

  private def qPackSequences(s: SparkSession, dir: String): DataFrame =
    Curation.packSequences(docs(s, dir), "doc_id",
      TextOps.tokenCount(col("text")), SeqLen)
      .orderBy("doc_id")

  private val qPackSequencesSql =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tokens
       |  FROM documents),
       |o AS (
       |  SELECT doc_id, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
       |  FROM t)
       |SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       |  CAST(start_offset // $SeqLen AS BIGINT) AS first_seq,
       |  CAST((start_offset + GREATEST(n_tokens, 1) - 1) // $SeqLen AS BIGINT) AS last_seq
       |FROM o ORDER BY doc_id""".stripMargin

  // ----------------------- C43: the composed raw-crawl → corpus funnel
  // The flagship end-to-end query: exact dedup → MinHash near-dup dedup
  // → decontamination vs the held-out set (doc_id % 31 == 0) → quality
  // floor → leak-safe split → train-split sequence packing, ALL stages
  // as one composed plan (ops/CurationPipeline.scala). The oracle
  // re-derives every stage in DuckDB from the already-proven per-stage
  // twins, so the driver pins the composition, not just the parts.
  private val PipeSeqLen = 128

  private def qCuratePipeline(s: SparkSession, dir: String): DataFrame =
    graft.ops.CurationPipeline.curate(
      docs(s, dir), "doc_id", "text",
      isEval = col("doc_id") % 31 === 0,
      graft.ops.CurationPipeline.Config(
        shingleN = LlmOpsQueries.ShingleN,
        numHashes = LlmOpsQueries.NumHashes,
        bandSize = LlmOpsQueries.BandSize,
        maxBucketSize = Int.MaxValue,
        contaminationN = 7, contaminationMinShared = 3,
        contaminationMaxDf = 100, minQuality = 0.3,
        trainPct = 80, valPct = 10, seqLen = PipeSeqLen))
      .select(col("doc_id"), col("quality"), col("split"),
        col("n_tokens"), col("start_offset"), col("first_seq"),
        col("last_seq"))
      .orderBy("doc_id")

  private val qCuratePipelineSql = {
    import LlmOpsQueries.{ShingleN, NumHashes, BandSize}
    val minhashes = (0 until NumHashes)
      .map(j => s"MIN(md5('$j:' || s)) AS h$j").mkString(",\n    ")
    val bands = (0 until NumHashes / BandSize).map { b =>
      val sig = (0 until BandSize).map(k => s"h${b * BandSize + k}")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band_id, $sig AS sig FROM mh"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH RECURSIVE
       |train AS (SELECT doc_id, text FROM documents WHERE doc_id % 31 <> 0),
       |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 31 = 0),
       |t1 AS (
       |  SELECT MIN(doc_id) AS doc_id FROM (
       |    SELECT doc_id, md5($sqlNorm) AS fp FROM train) GROUP BY fp),
       |norm1 AS (
       |  SELECT d.doc_id, $sqlToks AS toks FROM train d JOIN t1 USING (doc_id)),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, UNNEST([array_to_string(toks[i:i+${ShingleN - 1}], ' ')
       |      for i in range(1, len(toks) - ${ShingleN - 2})]) AS s
       |    FROM norm1 WHERE len(toks) >= $ShingleN)),
       |mh AS (SELECT doc_id, $minhashes FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bands),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bands l JOIN bands r ON l.band_id = r.band_id AND l.sig = r.sig
       |  WHERE l.doc_id < r.doc_id),
       |edges AS (
       |  SELECT a AS u, b AS v FROM pairs
       |  UNION SELECT b AS u, a AS v FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |clusters AS (
       |  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster
       |  FROM reach GROUP BY u),
       |t2 AS (
       |  SELECT t.doc_id FROM t1 t LEFT JOIN clusters c USING (doc_id)
       |  WHERE c.cluster IS NULL OR c.cluster = t.doc_id),
       |cnorm AS (
       |  SELECT d.doc_id, $sqlToks AS toks, FALSE AS is_eval
       |  FROM train d JOIN t2 USING (doc_id)
       |  UNION ALL
       |  SELECT doc_id, $sqlToks AS toks, TRUE AS is_eval FROM ev),
       |sh7 AS (
       |  SELECT DISTINCT doc_id, is_eval, g AS shg FROM (
       |    SELECT doc_id, is_eval, UNNEST([array_to_string(toks[i:i+6], ' ')
       |      for i in range(1, len(toks) - 5)]) AS g
       |    FROM cnorm WHERE len(toks) >= 7)),
       |sh7c AS (
       |  SELECT doc_id, is_eval, shg FROM (
       |    SELECT doc_id, is_eval, shg, COUNT(*) OVER (PARTITION BY shg) AS df
       |    FROM sh7)
       |  WHERE df <= 100),
       |contaminated AS (
       |  SELECT DISTINCT t.doc_id
       |  FROM sh7c t JOIN sh7c e ON t.shg = e.shg
       |  WHERE NOT t.is_eval AND e.is_eval
       |  GROUP BY t.doc_id, e.doc_id
       |  HAVING COUNT(DISTINCT t.shg) >= 3),
       |t3 AS (
       |  SELECT doc_id FROM t2
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |scored AS (SELECT doc_id, $sqlQuality AS quality FROM documents),
       |t4 AS (
       |  SELECT t.doc_id, s.quality FROM t3 t JOIN scored s USING (doc_id)
       |  WHERE s.quality >= 0.3),
       |assigned AS (
       |  SELECT t.doc_id, t.quality, COALESCE(c.cluster, t.doc_id) AS cluster
       |  FROM t4 t LEFT JOIN clusters c USING (doc_id)),
       |splits AS (
       |  SELECT doc_id, quality,
       |    CASE WHEN bkt < 80 THEN 'train'
       |         WHEN bkt < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (SELECT doc_id, quality,
       |          CAST('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bkt
       |        FROM assigned)),
       |toklen AS (
       |  SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tokens
       |  FROM documents),
       |packed AS (
       |  SELECT s.doc_id, t.n_tokens,
       |    COALESCE(SUM(t.n_tokens) OVER (ORDER BY s.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
       |  FROM splits s JOIN toklen t USING (doc_id) WHERE s.split = 'train')
       |SELECT s.doc_id, s.quality, s.split, p.n_tokens,
       |  CAST(p.start_offset AS BIGINT) AS start_offset,
       |  CAST(p.start_offset // $PipeSeqLen AS BIGINT) AS first_seq,
       |  CAST((p.start_offset + GREATEST(p.n_tokens, 1) - 1) // $PipeSeqLen AS BIGINT) AS last_seq
       |FROM splits s LEFT JOIN packed p USING (doc_id)
       |ORDER BY s.doc_id""".stripMargin
  }

  // ---------------- C98: URL canonicalization + domain blocklist
  // Each doc gets a deterministically MESSY synthetic URL (scheme/host
  // case noise, www., tracking params, fragments, trailing slashes —
  // variant chosen by doc_id residues); Spark runs the real
  // canonicalization chain, while the oracle constructs the EXPECTED
  // clean URL from first principles — an independent derivation, so a
  // regex bug on either side breaks the hash ("the construction is the
  // spec", like q_conversations). Blocklist = site{n}.com for n % 4 == 0,
  // applied as a broadcast left-anti on the registered domain.
  private def urlFrame(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val scheme = when(d % 4 === 0, "HTTPS://WWW.")
      .when(d % 4 === 1, "https://")
      .when(d % 4 === 2, "HTTP://Www.").otherwise("http://")
    val host = concat(
      when(d % 7 === 0, lit("Docs.")).otherwise(lit("")),
      lit("Site"), (d % 37).cast("string"), lit(".COM"))
    val path = concat(lit("/Docs/Page-"), d.cast("string"),
      when(d % 3 === 0, lit("/")).otherwise(lit("")))
    val query = when(d % 6 === 3, lit(""))
      .when(d % 2 === 0,
        concat(lit("?utm_source=feed&id="), d.cast("string"),
          lit("&utm_campaign=Spring")))
      .otherwise(concat(lit("?id="), d.cast("string"), lit("&ref=tw")))
    val frag = when(d % 5 === 0, lit("#Section-2")).otherwise(lit(""))
    docs(s, dir).select(d.as("doc_id"),
      concat(scheme, host, path, query, frag).as("url"))
  }

  private def qUrlCanon(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val canon = Curation.canonicalizeUrls(urlFrame(s, dir), "url")
    val blocklist = (0 until 37).filter(_ % 4 == 0)
      .map(n => s"site$n.com").toDF("domain")
    Curation.filterBlockedDomains(canon, "url_domain", blocklist, "domain")
      .select(col("doc_id"), col("url_canon"), col("url_domain"))
      .orderBy("doc_id")
  }

  private val qUrlCanonSql =
    """SELECT doc_id,
      |  (CASE WHEN doc_id % 4 IN (0, 1) THEN 'https://' ELSE 'http://' END)
      |  || (CASE WHEN doc_id % 7 = 0 THEN 'docs.' ELSE '' END)
      |  || 'site' || CAST(doc_id % 37 AS VARCHAR) || '.com'
      |  || '/Docs/Page-' || CAST(doc_id AS VARCHAR)
      |  || (CASE WHEN doc_id % 3 = 0 AND doc_id % 6 <> 3 THEN '/' ELSE '' END)
      |  || (CASE WHEN doc_id % 6 = 3 THEN ''
      |           ELSE '?id=' || CAST(doc_id AS VARCHAR) END) AS url_canon,
      |  'site' || CAST(doc_id % 37 AS VARCHAR) || '.com' AS url_domain
      |FROM documents
      |WHERE (doc_id % 37) % 4 <> 0
      |ORDER BY doc_id""".stripMargin

  // -------------- C102: data-constrained epoch allocation
  // Budget 400k over the 153k-unique corpus (n_chars as the token
  // unit): epochs = 2 with a partial third pass spread proportionally
  // — the repeat branch AND the leftover branch both exercised; the
  // subsample and cap branches are unit-pinned.
  private val EpochBudget = 400000L
  private val EpochCap = 4

  private def qEpochAlloc(s: SparkSession, dir: String): DataFrame =
    Curation.epochAllocation(docs(s, dir), "source", "n_chars",
      EpochBudget, EpochCap)
      .orderBy("source")

  private val qEpochAllocSql =
    s"""WITH per AS (
       |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS unique_tokens
       |  FROM documents GROUP BY source),
       |u AS (SELECT CAST(SUM(unique_tokens) AS BIGINT) AS u FROM per),
       |alloc AS (
       |  SELECT per.source, per.unique_tokens,
       |    LEAST($EpochCap, $EpochBudget // u.u) AS epochs,
       |    CASE WHEN LEAST($EpochCap, $EpochBudget // u.u) >= $EpochCap
       |         THEN 0
       |         ELSE $EpochBudget - LEAST($EpochCap, $EpochBudget // u.u) * u.u
       |    END AS rem,
       |    u.u AS u
       |  FROM per CROSS JOIN u)
       |SELECT source, unique_tokens, CAST(epochs AS BIGINT) AS epochs,
       |  CAST((unique_tokens * rem) // u AS BIGINT) AS extra_tokens,
       |  CAST(epochs * unique_tokens + (unique_tokens * rem) // u AS BIGINT)
       |    AS allocated_tokens
       |FROM alloc
       |ORDER BY source""".stripMargin

  // -------------- C103: MAD-based robust outliers (Hampel's rule)
  // n_chars per source, k=3. The oracle re-derives BOTH exact lower
  // medians (value, then deviation) via per-source ROW_NUMBER at rank
  // (n+1) // 2 and replays the integral comparison.
  private val MadK = 3

  private def qMadOutliers(s: SparkSession, dir: String): DataFrame =
    Curation.madOutliers(docs(s, dir), "doc_id", "source", "n_chars", MadK)
      .orderBy("doc_id")

  private val qMadOutliersSql =
    s"""WITH base AS (
       |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v
       |  FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
       |sz AS (SELECT source, COUNT(*) AS n FROM base GROUP BY source),
       |r1 AS (
       |  SELECT doc_id, source, v,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY v, doc_id) AS rk
       |  FROM base),
       |med AS (
       |  SELECT r1.source, r1.v AS med FROM r1
       |  JOIN sz ON sz.source IS NOT DISTINCT FROM r1.source
       |   AND r1.rk = (sz.n + 1) // 2),
       |d AS (
       |  SELECT b.doc_id, b.source, b.v, m.med, ABS(b.v - m.med) AS dev
       |  FROM base b JOIN med m ON m.source IS NOT DISTINCT FROM b.source),
       |r2 AS (
       |  SELECT doc_id, source, dev,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rk
       |  FROM d),
       |mad AS (
       |  SELECT r2.source, r2.dev AS mad FROM r2
       |  JOIN sz ON sz.source IS NOT DISTINCT FROM r2.source
       |   AND r2.rk = (sz.n + 1) // 2)
       |SELECT d.doc_id, d.source, d.v AS value, d.med, d.dev, mad.mad,
       |  d.dev > $MadK * mad.mad AS is_outlier
       |FROM d JOIN mad ON mad.source IS NOT DISTINCT FROM d.source
       |ORDER BY d.doc_id""".stripMargin

  // ---------- C104: rendezvous (highest-random-weight) sharding
  private val RvShards = 16

  private def qRendezvous(s: SparkSession, dir: String): DataFrame =
    Curation.rendezvousShard(
      docs(s, dir).select(col("doc_id")), "doc_id", RvShards)
      .select(col("doc_id"), col("shard"))
      .orderBy("doc_id")

  private val qRendezvousSql =
    s"""WITH scored AS (
       |  SELECT doc_id, t.s AS s,
       |    CAST('0x' || substr(md5('rv:' || CAST(t.s AS VARCHAR) || ':'
       |      || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS score
       |  FROM documents, UNNEST(range($RvShards)) AS t(s))
       |SELECT doc_id, CAST(s AS INTEGER) AS shard
       |FROM (SELECT doc_id, s,
       |        ROW_NUMBER() OVER (PARTITION BY doc_id
       |          ORDER BY score DESC, s ASC) AS rn
       |      FROM scored)
       |WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  // ---------------- C105: per-stratum sequence packing
  private val PackStrataSeqLen = 512

  private def qPackBySource(s: SparkSession, dir: String): DataFrame =
    Curation.packSequencesByStratum(docs(s, dir), "doc_id", "source",
      col("n_chars"), PackStrataSeqLen)
      .orderBy("source", "doc_id")

  private val qPackBySourceSql =
    s"""WITH packed AS (
       |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_tokens,
       |    COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS start_offset
       |  FROM documents WHERE doc_id IS NOT NULL)
       |SELECT source, doc_id, n_tokens,
       |  CAST(start_offset AS BIGINT) AS start_offset,
       |  CAST(start_offset // $PackStrataSeqLen AS BIGINT) AS first_seq,
       |  CAST((start_offset + GREATEST(n_tokens, 1) - 1)
       |    // $PackStrataSeqLen AS BIGINT) AS last_seq
       |FROM packed
       |ORDER BY source, doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_by_source" -> qPackBySource _,
    "q_shard_rendezvous" -> qRendezvous _,
    "q_mad_outliers" -> qMadOutliers _,
    "q_epoch_alloc" -> qEpochAlloc _,
    "q_url_canon" -> qUrlCanon _,
    "q_boilerplate" -> qBoilerplate _,
    "q_split_leaksafe" -> qSplitLeaksafe _,
    "q_kfold" -> qKfold _,
    "q_token_budget" -> qTokenBudget _,
    "q_pack_sequences" -> qPackSequences _,
    "q_curate_pipeline" -> qCuratePipeline _)

  def oracleSql: Map[String, String] = Map(
    "q_pack_by_source" -> qPackBySourceSql,
    "q_shard_rendezvous" -> qRendezvousSql,
    "q_mad_outliers" -> qMadOutliersSql,
    "q_epoch_alloc" -> qEpochAllocSql,
    "q_url_canon" -> qUrlCanonSql,
    "q_boilerplate" -> qBoilerplateSql,
    "q_split_leaksafe" -> qSplitLeaksafeSql,
    "q_kfold" -> qKfoldSql,
    "q_token_budget" -> qTokenBudgetSql,
    "q_pack_sequences" -> qPackSequencesSql,
    "q_curate_pipeline" -> qCuratePipelineSql)
}
