package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.functions.HashExprs
import graft.ops.{Dedup, Graph}

/** Corpus-graph, index-structure, and sampling queries (SURVEY.md §2
  * A39, C88–C90, C92–C93): star-contraction components, pointer-
  * doubling hierarchy flattening, inverted-index construction,
  * co-occurrence lift, DSIR-style importance scoring, and priority
  * sampling. Every query hash-matches a DuckDB oracle re-deriving the
  * full pipeline.
  */
object CorpusGraphQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Dedup.fanOut(Tables.load(s, dir, "documents"))

  import LlmOpsQueries.{sqlNorm, sqlToks}

  // ------------- C88: connected components (large-star / small-star)
  // Over a deterministically sparsified cut of the shared link graph
  // (keep an edge when md5("cckeep:u:v") mod 3 = 0) so the component
  // structure is non-trivial — the full graph at 3 links/doc is one
  // giant component. DuckDB re-derives via recursive transitive
  // closure to the same min-reachable-id labels.
  private def ccEdges(s: SparkSession, dir: String): DataFrame =
    TrainingPrepQueries.linkEdges(s, dir)
      .filter(HashExprs.md5Mod(
        concat(lit("cckeep:"), col("src").cast("string"), lit(":"),
          col("dst").cast("string")), 8, lit(3L)) === 0L)

  private def qConnectedComponents(s: SparkSession, dir: String): DataFrame =
    Graph.connectedComponents(ccEdges(s, dir), "src", "dst")
      .orderBy("id")

  private val qConnectedComponentsSql =
    s"""WITH RECURSIVE ${TrainingPrepQueries.sqlEdges},
       |ce AS (
       |  SELECT u, v FROM e
       |  WHERE CAST('0x' || substr(md5('cckeep:' || CAST(u AS VARCHAR)
       |    || ':' || CAST(v AS VARCHAR)), 1, 8) AS BIGINT) % 3 = 0),
       |und AS (SELECT u, v FROM ce UNION SELECT v, u FROM ce),
       |cn AS (SELECT u AS id FROM und UNION SELECT v AS id FROM und),
       |reach(u, v) AS (
       |  SELECT u, v FROM und
       |  UNION
       |  SELECT r.u, e2.v FROM reach r JOIN und e2 ON r.v = e2.u)
       |SELECT cn.id,
       |  CAST(LEAST(cn.id, MIN(reach.v)) AS BIGINT) AS component
       |FROM cn LEFT JOIN reach ON reach.u = cn.id
       |GROUP BY cn.id ORDER BY cn.id""".stripMargin

  // --------- C89: inverted index (df window + capped posting lists)
  // The synthetic corpus has a compact vocabulary (31 types at sf0.01,
  // df 25..402 over 500 docs): maxDf=395 actually exercises the
  // stopword-grade cut (drops the hottest types) while keeping most of
  // the vocabulary indexed.
  private val IdxMinDf = 2L
  private val IdxMaxDf = 395L
  private val IdxPostings = 5

  private def qInvertedIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.invertedIndex(docs(s, dir), "doc_id", "text",
      IdxMinDf, IdxMaxDf, IdxPostings).orderBy("term", "rank")

  private val qInvertedIndexSql =
    s"""WITH tf AS (
       |  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, UNNEST($sqlToks) AS term FROM documents)
       |  WHERE len(term) > 0 GROUP BY term, doc_id),
       |dft AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
       |  GROUP BY term
       |  HAVING COUNT(*) BETWEEN $IdxMinDf AND $IdxMaxDf),
       |r AS (
       |  SELECT tf.term, df, doc_id, tf.tf,
       |    ROW_NUMBER() OVER (PARTITION BY tf.term
       |      ORDER BY tf.tf DESC, doc_id) AS rank
       |  FROM tf JOIN dft USING (term))
       |SELECT term, df, CAST(rank AS INTEGER) AS rank, doc_id, tf
       |FROM r WHERE rank <= $IdxPostings
       |ORDER BY term, rank""".stripMargin

  // ------------- C90: co-occurrence lift (integer-exact PMI proxy)
  private val LiftVocab = 20
  private val LiftMinPair = 2L
  private val LiftScale = 1000000L

  private def qCooccurrence(s: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusStats.cooccurrenceLift(docs(s, dir), "doc_id", "text",
      LiftVocab, LiftMinPair, LiftScale).orderBy("term_a", "term_b")

  private val qCooccurrenceSql =
    s"""WITH pres AS (
       |  SELECT DISTINCT doc_id AS id, term
       |  FROM (SELECT doc_id, UNNEST($sqlToks) AS term FROM documents)
       |  WHERE len(term) > 0 AND doc_id IS NOT NULL),
       |n AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id IS NOT NULL),
       |vocab AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS tdf FROM pres
       |  GROUP BY term ORDER BY COUNT(*) DESC, term LIMIT $LiftVocab),
       |p AS (SELECT id, pres.term, tdf FROM pres JOIN vocab USING (term))
       |SELECT a.term AS term_a, b.term AS term_b,
       |  a.tdf AS n_a, b.tdf AS n_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_ab,
       |  CAST((((COUNT(*) * $LiftScale) // a.tdf) * MIN(n.n)) // b.tdf
       |    AS BIGINT) AS lift_scaled
       |FROM p a JOIN p b ON a.id = b.id AND a.term < b.term
       |CROSS JOIN n
       |GROUP BY a.term, b.term, a.tdf, b.tdf
       |HAVING COUNT(*) >= $LiftMinPair
       |ORDER BY term_a, term_b""".stripMargin

  // --------- A39: hierarchy flattening (pointer doubling vs
  // recursive CTE): the documents table as a binary category tree —
  // parent(d) = d div 2, doc 0 the root. Depth ~9 at 500 docs; the
  // operator reaches it in 4 doubling rounds.
  private def qHierarchy(s: SparkSession, dir: String): DataFrame =
    Graph.flattenHierarchy(
      docs(s, dir).select(col("doc_id").as("id"),
        when(col("doc_id") === 0L, lit(null).cast("long"))
          .otherwise(expr("doc_id div 2")).as("parent")),
      "id", "parent").orderBy("id")

  private val qHierarchySql =
    s"""WITH RECURSIVE h AS (
       |  SELECT doc_id AS id,
       |    CASE WHEN doc_id = 0 THEN NULL ELSE doc_id // 2 END AS parent
       |  FROM documents),
       |walk(id, anc, depth) AS (
       |  SELECT id, parent, CAST(1 AS BIGINT) FROM h
       |  WHERE parent IS NOT NULL
       |  UNION ALL
       |  SELECT w.id, h2.parent, w.depth + 1
       |  FROM walk w JOIN h h2 ON h2.id = w.anc
       |  WHERE h2.parent IS NOT NULL)
       |SELECT id, anc AS root, depth FROM walk w
       |WHERE NOT EXISTS (SELECT 1 FROM h
       |  WHERE h.id = w.anc AND h.parent IS NOT NULL)
       |UNION ALL
       |SELECT id, id AS root, CAST(0 AS BIGINT) AS depth FROM h
       |WHERE parent IS NULL
       |ORDER BY id""".stripMargin

  // -------- C92: DSIR-style importance scoring (target = English
  // docs): bucket weights learned from the corpus's own target-vs-raw
  // hashed n-gram contrast, then every doc scored by its sum.
  private val ImpBuckets = 256
  private val ImpScale = 1000000L

  private def qImportance(s: SparkSession, dir: String): DataFrame =
    graft.ops.QualityModel.importanceScore(docs(s, dir), "doc_id", "text",
      col("lang") === "en", ImpBuckets, ImpScale).orderBy("doc_id")

  private val qImportanceSql =
    s"""WITH norm AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents),
       |uni AS (
       |  SELECT doc_id, lang, 'qf:' || t AS f
       |  FROM norm, UNNEST(toks) AS u(t) WHERE len(t) > 0),
       |bi AS (
       |  SELECT doc_id, lang,
       |    UNNEST(['qf2:' || array_to_string(toks[i:i+1], ' ')
       |      for i in range(1, len(toks))]) AS f
       |  FROM norm WHERE len(toks) >= 2),
       |feats AS (SELECT doc_id, lang, f FROM uni
       |  UNION ALL SELECT doc_id, lang, f FROM bi),
       |b AS (
       |  SELECT doc_id, lang,
       |    CAST('0x' || substr(md5(f), 1, 6) AS BIGINT) % $ImpBuckets AS bucket
       |  FROM feats),
       |stats AS (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_r,
       |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_t
       |  FROM b GROUP BY bucket),
       |tots AS (SELECT CAST(SUM(c_r) AS BIGINT) AS tot_r,
       |  CAST(SUM(c_t) AS BIGINT) AS tot_t FROM stats),
       |w AS (
       |  SELECT bucket,
       |    ((c_t + 1) * $ImpScale) // (tot_t + $ImpBuckets)
       |      - ((c_r + 1) * $ImpScale) // (tot_r + $ImpBuckets) AS w
       |  FROM stats CROSS JOIN tots),
       |per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       |    CAST(SUM(w.w) AS BIGINT) AS score_scaled
       |  FROM b JOIN w USING (bucket) GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(per.n_feats, 0) AS n_feats,
       |  per.score_scaled
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN per USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ------ C93: priority sampling (weighted w/o replacement + unbiased
  // subset-sum estimator), weight = n_chars: long documents
  // proportionally likelier, token totals estimable from the sample.
  private val PrioK = 60

  private def qPrioritySample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.prioritySample(docs(s, dir), "doc_id", "n_chars",
      PrioK).orderBy("rank")

  private val qPrioritySampleSql =
    s"""WITH keyed AS (
       |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
       |    CAST('0x' || substr(md5('prio:' || CAST(doc_id AS VARCHAR)),
       |      1, 13) AS BIGINT) // CAST(n_chars AS BIGINT) AS p
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0),
       |r AS (
       |  SELECT doc_id, w, p,
       |    ROW_NUMBER() OVER (ORDER BY p, doc_id) AS rank
       |  FROM keyed),
       |tau AS (SELECT p AS tau FROM r WHERE rank = ${PrioK + 1})
       |SELECT CAST(rank AS INTEGER) AS rank, doc_id, w AS weight,
       |  p AS priority,
       |  CAST(CASE WHEN tau.tau IS NULL THEN w
       |    ELSE greatest(w, tau.tau) END AS BIGINT) AS est_weight
       |FROM r LEFT JOIN tau ON TRUE
       |WHERE rank <= $PrioK
       |ORDER BY rank""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_connected_components" -> qConnectedComponents _,
      "q_inverted_index" -> qInvertedIndex _,
      "q_cooccurrence" -> qCooccurrence _,
      "q_hierarchy" -> qHierarchy _,
      "q_importance" -> qImportance _,
      "q_priority_sample" -> qPrioritySample _)

  override val oracleSql: Map[String, String] = Map(
    "q_connected_components" -> qConnectedComponentsSql,
    "q_inverted_index" -> qInvertedIndexSql,
    "q_cooccurrence" -> qCooccurrenceSql,
    "q_hierarchy" -> qHierarchySql,
    "q_importance" -> qImportanceSql,
    "q_priority_sample" -> qPrioritySampleSql)
}
