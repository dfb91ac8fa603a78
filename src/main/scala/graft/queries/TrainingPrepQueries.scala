package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.ops.{Conversations, Curation, Dedup, Graph, Similarity, TextOps}

/** Training-data preparation queries (SURVEY.md §2 C63–C68, C74, C77):
  * link-graph quality signals (deterministic integer PageRank, degree
  * stats, and anchor-text aggregation over a reproducible synthetic
  * hyperlink graph), multi-turn conversation flattening for instruction
  * data, exact skew-safe curriculum ranking and quantile trimming,
  * product-quantization codes, and deterministic shuffle-sharding.
  * Every query is hash-compared against a DuckDB oracle that re-derives
  * the full pipeline — md5-drawn edges and anchors, the unrolled
  * integer PageRank iterations, JSON turn construction, PQ distance
  * chains, and the exact ranks — value for value.
  */
object TrainingPrepQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Dedup.fanOut(Tables.load(s, dir, "documents"))
  private def embs(s: SparkSession, dir: String): DataFrame =
    Dedup.fanOut(Tables.load(s, dir, "embeddings"))

  import LlmOpsQueries.sqlNorm

  // Shared constants — declared first (object init order; see
  // RetrievalQueries).
  private val LinksPerDoc = 3
  private val PrIters = 3
  private val PrDamping = 85
  private val PrTotal = 1000000000000L
  private val CurrStages = 4
  private val TrimLow = 5
  private val TrimHigh = 95
  private[queries] val PqM = 4
  private[queries] val PqK = 8
  // testdata embeddings are 64-wide at every SF; the operator reads the
  // width from the data (vecDim), the oracle needs it for slice bounds
  private[queries] val PqDim = 64

  /** Deterministic synthetic hyperlink graph: each document draws
    * [[LinksPerDoc]] out-links, draw i targeting doc
    * md5("link:{id}:{i}")[0:12] mod N — the [[graft.ops.Retrieval
    * .negativeSamples]] reproducible-draw idiom. Self-draws are
    * dropped; coinciding draws dedupe (the operator dedups edges
    * anyway). Both engines derive the identical edge set. */
  private[queries] def linkEdges(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val n = d.count()
    d.select(col("doc_id").as("src"),
      explode(array((0 until LinksPerDoc).map(lit): _*)).as("draw"))
      .withColumn("dst",
        graft.functions.HashExprs.md5Mod(
          concat(lit("link:"), col("src").cast("string"), lit(":"),
            col("draw").cast("string")), 12, lit(n)))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
  }

  // NOTE: a raw margin-bearing fragment — embedded into the outer query
  // templates BEFORE their single .stripMargin (stripping twice would
  // eat the leading '|' of a line-initial '||' concat).
  private[queries] val sqlEdges =
    s"""n AS (SELECT COUNT(*) AS n FROM documents),
       |e0 AS (
       |  SELECT doc_id AS u,
       |    CAST('0x' || substr(md5('link:' || CAST(doc_id AS VARCHAR) ||
       |      ':' || CAST(i AS VARCHAR)), 1, 12) AS BIGINT) % n.n AS v
       |  FROM documents CROSS JOIN n, UNNEST(range($LinksPerDoc)) AS t(i)),
       |e AS (SELECT DISTINCT u, v FROM e0 WHERE u <> v),
       |nodes AS (SELECT u AS id FROM e UNION SELECT v AS id FROM e),
       |nn AS (SELECT COUNT(*) AS nn FROM nodes),
       |outd AS (SELECT u, COUNT(*) AS od FROM e GROUP BY u)"""

  // ------------------------- C63: deterministic integer PageRank
  private def qPagerank(s: SparkSession, dir: String): DataFrame =
    Graph.pageRank(linkEdges(s, dir), "src", "dst",
      PrIters, PrDamping, PrTotal).orderBy("id")

  private val qPagerankSql = {
    // Unrolled iterations: r0 → (c1, r1) → … — each level is the exact
    // integer recurrence the operator runs (init = total // N,
    // base = ((100−d) · init) // 100, contribution = r // outdeg).
    val levels = (1 to PrIters).map { i =>
      s"""c$i AS (
         |  SELECT e.v AS id, CAST(SUM(r${i - 1}.r // outd.od) AS BIGINT) AS cs
         |  FROM e JOIN outd USING (u) JOIN r${i - 1} ON r${i - 1}.id = e.u
         |  GROUP BY e.v),
         |r$i AS (
         |  SELECT nodes.id,
         |    ((100 - $PrDamping) * ($PrTotal // nn.nn)) // 100
         |      + ($PrDamping * COALESCE(c$i.cs, 0)) // 100 AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN c$i ON c$i.id = nodes.id)"""
    }.mkString(",\n") // raw fragments: the outer template strips margins once
    s"""WITH $sqlEdges,
       |r0 AS (SELECT id, $PrTotal // nn.nn AS r FROM nodes CROSS JOIN nn),
       |$levels
       |SELECT id, CAST(r AS BIGINT) AS rank_scaled FROM r$PrIters
       |ORDER BY id""".stripMargin
  }

  // --------------------- C95: personalized (seed-teleport) PageRank
  // Seeds = documents with doc_id % 10 == 0 (a deterministic "trusted
  // tenth"); the operator intersects them with the edge-derived node
  // set, exactly as the oracle's `WHERE id % 10 = 0` over nodes does.
  // Unrolled like qPagerankSql, with the uniform base replaced by the
  // seed-gated base and the zero-init for non-seeds.
  private def qPpr(s: SparkSession, dir: String): DataFrame =
    Graph.personalizedPageRank(linkEdges(s, dir), "src", "dst",
      docs(s, dir).filter(col("doc_id") % 10 === 0), "doc_id",
      PrIters, PrDamping, PrTotal).orderBy("id")

  private val qPprSql = {
    val levels = (1 to PrIters).map { i =>
      s"""c$i AS (
         |  SELECT e.v AS id, CAST(SUM(r${i - 1}.r // outd.od) AS BIGINT) AS cs
         |  FROM e JOIN outd USING (u) JOIN r${i - 1} ON r${i - 1}.id = e.u
         |  GROUP BY e.v),
         |r$i AS (
         |  SELECT nodes.id,
         |    CASE WHEN nodes.id % 10 = 0
         |      THEN ((100 - $PrDamping) * ($PrTotal // sn.sn)) // 100
         |      ELSE 0 END
         |      + ($PrDamping * COALESCE(c$i.cs, 0)) // 100 AS r
         |  FROM nodes CROSS JOIN sn LEFT JOIN c$i ON c$i.id = nodes.id)"""
    }.mkString(",\n")
    s"""WITH $sqlEdges,
       |sn AS (SELECT COUNT(*) AS sn FROM nodes WHERE id % 10 = 0),
       |r0 AS (
       |  SELECT id, CASE WHEN id % 10 = 0 THEN $PrTotal // sn.sn ELSE 0 END AS r
       |  FROM nodes CROSS JOIN sn),
       |$levels
       |SELECT id, CAST(r AS BIGINT) AS rank_scaled FROM r$PrIters
       |ORDER BY id""".stripMargin
  }

  // ------------- C99: synchronous label-propagation communities
  // 3 deterministic rounds over the symmetrized md5 link graph; the
  // oracle unrolls each round's (neighbor-label count, argmax with
  // count DESC / label ASC ties) exactly.
  private val LpaRounds = 3

  private def qCommunities(s: SparkSession, dir: String): DataFrame =
    Graph.labelPropagation(linkEdges(s, dir), "src", "dst", LpaRounds)
      .orderBy("id")

  private val qCommunitiesSql = {
    val levels = (1 to LpaRounds).map { i =>
      s"""nl$i AS (
         |  SELECT es.v AS id, l${i - 1}.l AS l, COUNT(*) AS c
         |  FROM es JOIN l${i - 1} ON l${i - 1}.id = es.u
         |  GROUP BY es.v, l${i - 1}.l),
         |l$i AS (
         |  SELECT id, l FROM (
         |    SELECT id, l,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, l ASC) AS rn
         |    FROM nl$i) WHERE rn = 1)"""
    }.mkString(",\n")
    s"""WITH $sqlEdges,
       |es AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
       |l0 AS (SELECT id, id AS l FROM nodes),
       |$levels
       |SELECT nodes.id, CAST(COALESCE(l$LpaRounds.l, nodes.id) AS BIGINT) AS community
       |FROM nodes LEFT JOIN l$LpaRounds ON l$LpaRounds.id = nodes.id
       |ORDER BY nodes.id""".stripMargin
  }

  // ------------------------------- C64: degree + reciprocity stats
  private def qGraphDegrees(s: SparkSession, dir: String): DataFrame =
    Graph.degreeStats(linkEdges(s, dir), "src", "dst").orderBy("id")

  private val qGraphDegreesSql =
    s"""WITH $sqlEdges,
       |ind AS (SELECT v, COUNT(*) AS ind FROM e GROUP BY v),
       |recip AS (
       |  SELECT l.u, COUNT(*) AS rc
       |  FROM e l JOIN e r ON r.u = l.v AND r.v = l.u
       |  GROUP BY l.u)
       |SELECT nodes.id,
       |  CAST(COALESCE(outd.od, 0) AS BIGINT) AS out_deg,
       |  CAST(COALESCE(ind.ind, 0) AS BIGINT) AS in_deg,
       |  CAST(COALESCE(recip.rc, 0) AS BIGINT) AS n_reciprocal
       |FROM nodes
       |LEFT JOIN outd ON outd.u = nodes.id
       |LEFT JOIN ind ON ind.v = nodes.id
       |LEFT JOIN recip ON recip.u = nodes.id
       |ORDER BY nodes.id""".stripMargin

  // --------------------- C65: multi-turn conversation flattening
  // Deterministic synthetic chat corpus: content slices come from the
  // JSON-safe token stream (lowercase alphanumerics only — built
  // IDENTICALLY on both engines), laid out as user/assistant/user.
  private def convFrame(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(
      split(regexp_replace(TextOps.normalized(col("text")),
        "[^a-z0-9 ]", ""), " "),
      t => length(t) > 0)
    def seg(from: Int): Column =
      array_join(slice(toks, from, 12), " ")
    docs(s, dir).select(col("doc_id"),
      concat(lit("""[{"role":"user","content":""""), seg(1),
        lit(""""},{"role":"assistant","content":""""), seg(13),
        lit(""""},{"role":"user","content":""""), seg(25),
        lit(""""}]""")).as("conv_json"))
  }

  private def qConversations(s: SparkSession, dir: String): DataFrame =
    Conversations.flatten(convFrame(s, dir), "doc_id", "conv_json")
      .orderBy("doc_id", "turn_idx")

  // The oracle re-derives the turns from the same token stream (the
  // construction is the spec); the Spark side must round-trip them
  // through real JSON parsing to match.
  private val qConversationsSql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(
       |      regexp_replace($sqlNorm, '[^a-z0-9 ]', '', 'g'), ' '),
       |      t -> len(t) > 0) AS tk
       |  FROM documents),
       |turns AS (
       |  SELECT doc_id, 0 AS turn_idx, 'user' AS role,
       |    COALESCE(array_to_string(tk[1:12], ' '), '') AS content FROM toks
       |  UNION ALL
       |  SELECT doc_id, 1, 'assistant',
       |    COALESCE(array_to_string(tk[13:24], ' '), '')
       |  FROM toks
       |  UNION ALL
       |  SELECT doc_id, 2, 'user',
       |    COALESCE(array_to_string(tk[25:36], ' '), '')
       |  FROM toks)
       |SELECT doc_id, turn_idx, role, content,
       |  CAST(len(string_split(content, ' ')) AS BIGINT) AS n_tokens
       |FROM turns ORDER BY doc_id, turn_idx""".stripMargin

  // ----------------------- C74: top anchor texts per link target
  // Anchors draw from a 12-term vocabulary keyed on (src, draw) — the
  // same reproducible-draw idiom as the edges themselves, so both
  // engines derive the identical (src, dst, anchor) triples.
  private val AnchorVocab = 12
  private val AnchorTopN = 3

  private def anchorEdges(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val n = d.count()
    d.select(col("doc_id").as("src"),
      explode(array((0 until LinksPerDoc).map(lit): _*)).as("draw"))
      .withColumn("dst",
        graft.functions.HashExprs.md5Mod(
          concat(lit("link:"), col("src").cast("string"), lit(":"),
            col("draw").cast("string")), 12, lit(n)))
      .withColumn("anchor",
        concat(lit("a"), graft.functions.HashExprs.md5Mod(
          concat(lit("anchor:"), col("src").cast("string"), lit(":"),
            col("draw").cast("string")), 8, lit(AnchorVocab.toLong))
          .cast("string")))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("anchor"))
  }

  private def qAnchorText(s: SparkSession, dir: String): DataFrame =
    Graph.anchorTexts(anchorEdges(s, dir), "src", "dst", "anchor",
      AnchorTopN)
      .orderBy("dst", "rank")

  private val qAnchorTextSql =
    s"""WITH n AS (SELECT COUNT(*) AS n FROM documents),
       |e0 AS (
       |  SELECT doc_id AS src,
       |    CAST('0x' || substr(md5('link:' || CAST(doc_id AS VARCHAR) ||
       |      ':' || CAST(i AS VARCHAR)), 1, 12) AS BIGINT) % n.n AS dst,
       |    'a' || CAST(CAST('0x' || substr(md5('anchor:' ||
       |      CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 8)
       |      AS BIGINT) % $AnchorVocab AS VARCHAR) AS anchor
       |  FROM documents CROSS JOIN n, UNNEST(range($LinksPerDoc)) AS t(i)),
       |e AS (SELECT DISTINCT src, dst, anchor FROM e0 WHERE src <> dst),
       |cnt AS (
       |  SELECT dst, anchor, COUNT(*) AS n_refs FROM e GROUP BY dst, anchor),
       |r AS (
       |  SELECT dst, anchor, n_refs,
       |    ROW_NUMBER() OVER (PARTITION BY dst
       |      ORDER BY n_refs DESC, anchor) AS rank
       |  FROM cnt)
       |SELECT dst, CAST(rank AS INTEGER) AS rank, anchor,
       |  CAST(n_refs AS BIGINT) AS n_refs
       |FROM r WHERE rank <= $AnchorTopN
       |ORDER BY dst, rank""".stripMargin

  // ----------- C109: stride-scheduled proportional mixture interleave
  // Non-uniform weights over the 20 sources (1..4 cycling) so the
  // interleave actually reorders; scale = interleaveMix's default.
  private val MixWeights: Seq[(String, Long)] =
    (0 until 20).map(i => s"src$i" -> ((i % 4) + 1).toLong)

  private def qMixOrder(s: SparkSession, dir: String): DataFrame =
    Curation.interleaveMix(docs(s, dir), "doc_id", "source",
      MixWeights.toMap).orderBy("mix_key", "source", "doc_id")

  private val qMixOrderSql = {
    val vals = MixWeights.map { case (s, w) => s"('$s', $w)" }.mkString(", ")
    s"""WITH w(source, wt) AS (VALUES $vals),
       |base AS (
       |  SELECT doc_id, d.source, wt,
       |    CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)),
       |      1, 13) AS BIGINT) AS ord
       |  FROM documents d JOIN w ON d.source = w.source
       |  WHERE doc_id IS NOT NULL),
       |r AS (
       |  SELECT doc_id, source, wt,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY ord, doc_id) AS BIGINT) AS stratum_rank
       |  FROM base)
       |SELECT doc_id, source, stratum_rank,
       |  CAST((stratum_rank * 1000000) // wt AS BIGINT) AS mix_key
       |FROM r ORDER BY mix_key, source, doc_id""".stripMargin
  }

  // ------------------ C77: deterministic shuffle + shard assignment
  private val NumShards = 8

  private def qShuffleShards(s: SparkSession, dir: String): DataFrame =
    Curation.shuffleShards(docs(s, dir), "doc_id", NumShards)
      .orderBy("doc_id")

  private val qShuffleShardsSql =
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |    CAST(CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
       |      1, 8) AS BIGINT) % $NumShards AS INTEGER) AS shard,
       |    CAST('0x' || substr(md5('pos:' || CAST(doc_id AS VARCHAR)),
       |      1, 13) AS BIGINT) AS ord
       |  FROM documents WHERE doc_id IS NOT NULL)
       |SELECT doc_id, shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shard
       |    ORDER BY ord, doc_id) - 1 AS BIGINT) AS pos
       |FROM keyed
       |ORDER BY doc_id""".stripMargin

  // ------------------------- C66: exact skew-safe curriculum rank
  private def qCurriculum(s: SparkSession, dir: String): DataFrame =
    Curation.curriculum(docs(s, dir), "doc_id",
      TextOps.tokenCount(col("text")).cast("long"), CurrStages)
      .orderBy("doc_id")

  private val qCurriculumSql = {
    import LlmOpsQueries.sqlToks
    s"""WITH norm AS (
       |  SELECT doc_id, len($sqlToks) AS ntok FROM documents),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY ntok, doc_id) AS rank
       |  FROM norm)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank,
       |  CAST(((rank - 1) * $CurrStages) // n.n AS INTEGER) AS stage
       |FROM r CROSS JOIN n ORDER BY doc_id""".stripMargin
  }

  // --------------------- C67: per-source exact quantile trimming
  private def qQuantileTrim(s: SparkSession, dir: String): DataFrame =
    Curation.quantileTrim(
      docs(s, dir).select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
      "doc_id", "source", col("n_tokens"), TrimLow, TrimHigh)
      .orderBy("doc_id")

  private val qQuantileTrimSql = {
    import LlmOpsQueries.sqlToks
    s"""WITH norm AS (
       |  SELECT doc_id, source, CAST(len($sqlToks) AS BIGINT) AS n_tokens
       |  FROM documents WHERE doc_id IS NOT NULL),
       |r AS (
       |  SELECT doc_id, source, n_tokens,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY n_tokens ASC NULLS FIRST, doc_id) AS rank,
       |    COUNT(*) OVER (PARTITION BY source) AS n
       |  FROM norm)
       |SELECT doc_id, source, n_tokens, CAST(rank AS BIGINT) AS rank
       |FROM r
       |WHERE rank > ($TrimLow * n) // 100 AND rank <= ($TrimHigh * n) // 100
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------- C68: product-quantization encoding
  private def qPqCodes(s: SparkSession, dir: String): DataFrame =
    Similarity.pqEncode(embs(s, dir), "vec_id", "embedding", PqM, PqK)
      .orderBy("vec_id", "sub")

  /** The PQ re-derivation through the per-(vector, subspace, code)
    * distance CTE `cands` — shared with IndexingQueries' ADC search
    * oracle (codes AND query tables both read the same distances, so
    * the two PQ queries can never disagree on a centroid). One SELECT
    * per (subspace, code): squared-L2 to the md5-derived centroid,
    * summed by a left-fold list_reduce — the same left-associated +
    * chain as the operator's reduce(_ + _). */
  private[queries] val pqBaseCtes = {
    val sub = PqDim / PqM
    val cands = (0 until PqM).flatMap { s =>
      (0 until PqK).map { c =>
        val lo = s * sub + 1
        val hi = (s + 1) * sub
        s"""SELECT vec_id, $s AS sub, $c AS code,
           |    list_reduce(list_transform(
           |      list_transform(v[$lo:$hi], (x, j) ->
           |        x - ((CAST('0x' || substr(md5('pq$s:$c:' ||
           |          CAST(j - 1 AS VARCHAR)), 1, 6) AS BIGINT)
           |          / 16777216.0) - 0.5)),
           |      d -> d * d), (a, b) -> a + b) AS dist
           |  FROM v""".stripMargin
      }
    }.mkString("\n  UNION ALL\n  ")
    // the validity filter mirrors pqEncode's `valid` predicate: NULL or
    // wrong-width vectors get no distances, hence no code words — the
    // codes oracle re-adds their NULL-code rows, the search oracle
    // excludes them, exactly like the Spark side
    s"""v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $PqDim),
       |cands AS (
       |  $cands)""".stripMargin
  }

  private val qPqCodesSql =
    s"""WITH $pqBaseCtes,
       |cw AS (
       |  SELECT vec_id, sub, code FROM cands
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub
       |    ORDER BY dist, code) = 1)
       |SELECT e.vec_id, CAST(s.range AS INTEGER) AS sub, cw.code
       |FROM embeddings e CROSS JOIN range($PqM) s
       |LEFT JOIN cw ON cw.vec_id = e.vec_id AND cw.sub = s.range
       |ORDER BY e.vec_id, sub""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_pagerank" -> qPagerank _,
      "q_ppr" -> qPpr _,
      "q_communities" -> qCommunities _,
      "q_graph_degrees" -> qGraphDegrees _,
      "q_conversations" -> qConversations _,
      "q_curriculum" -> qCurriculum _,
      "q_anchor_text" -> qAnchorText _,
      "q_shuffle_shards" -> qShuffleShards _,
      "q_mix_order" -> qMixOrder _,
      "q_quantile_trim" -> qQuantileTrim _,
      "q_pq_codes" -> qPqCodes _)

  override val oracleSql: Map[String, String] = Map(
    "q_pagerank" -> qPagerankSql,
    "q_ppr" -> qPprSql,
    "q_communities" -> qCommunitiesSql,
    "q_graph_degrees" -> qGraphDegreesSql,
    "q_conversations" -> qConversationsSql,
    "q_curriculum" -> qCurriculumSql,
    "q_anchor_text" -> qAnchorTextSql,
    "q_shuffle_shards" -> qShuffleShardsSql,
    "q_mix_order" -> qMixOrderSql,
    "q_quantile_trim" -> qQuantileTrimSql,
    "q_pq_codes" -> qPqCodesSql)
}
