package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

/** Unit coverage for the training-prep layer (SURVEY §2 C63–C66):
  * integer PageRank, degree/reciprocity stats, conversation
  * flattening, and exact skew-safe curriculum ranking.
  */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------- C63: integer PageRank

  test("pagerank: hand-derived two-node exchange, exact integer values") {
    // 1 → 2, 2 → 1: symmetric, so ranks stay at init forever.
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val out = Graph.pageRank(e, "s", "d", iterations = 4,
      dampingPct = 85, totalScaled = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // init = 1000/2 = 500; base = 15*500/100 = 75;
    // each round: r = 75 + 85*500/100 = 75 + 425 = 500 — fixed point
    assert(out == Map(1L -> 500L, 2L -> 500L))
  }

  test("pagerank: a sink hub accumulates, a dangling node decays to base") {
    // 1 → 3, 2 → 3; 3 has no out-edges (dangling — its mass leaks).
    val e = Seq((1L, 3L), (2L, 3L)).toDF("s", "d")
    val out = Graph.pageRank(e, "s", "d", iterations = 1,
      dampingPct = 85, totalScaled = 3000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // init = 1000, base = 150; after 1 round:
    //   1, 2: no in-edges → base = 150
    //   3: 150 + 85*(1000+1000)/100 = 150 + 1700 = 1850
    assert(out == Map(1L -> 150L, 2L -> 150L, 3L -> 1850L))
    // total mass never exceeds totalScaled (integral divs only shave)
    assert(out.values.sum <= 3000L)
  }

  test("pagerank: deterministic under repartitioning") {
    val e = (0L until 200L).map(i => (i, (i * 7 + 3) % 200)).toDF("s", "d")
    val a = Graph.pageRank(e, "s", "d").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(e.repartition(13), "s", "d").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  // --------------------- C95: personalized (seed-teleport) PageRank

  test("ppr: hand-derived chain — mass flows from the seed, unreachable stays 0") {
    // 1 → 2 → 3, seed = {1}. init = 1000 at node 1, 0 elsewhere;
    // base(1) = 150, base(2) = base(3) = 0.
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("id")
    val r1 = Graph.personalizedPageRank(e, "s", "d", seeds, "id",
      iterations = 1, dampingPct = 85, totalScaled = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: r(1)=150+0; r(2)=0+85*1000/100=850; r(3)=0+85*0/100=0
    assert(r1 == Map(1L -> 150L, 2L -> 850L, 3L -> 0L))
    val r2 = Graph.personalizedPageRank(e, "s", "d", seeds, "id",
      iterations = 2, dampingPct = 85, totalScaled = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 2: r(1)=150; r(2)=85*150/100=127; r(3)=85*850/100=722
    assert(r2 == Map(1L -> 150L, 2L -> 127L, 3L -> 722L))
  }

  test("ppr: all-nodes seed set equals global pagerank") {
    val e = (0L until 100L).map(i => (i, (i * 7 + 3) % 100)).toDF("s", "d")
    val all = e.select(col("s").as("id"))
      .unionByName(e.select(col("d").as("id"))).distinct()
    val ppr = Graph.personalizedPageRank(e, "s", "d", all, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Graph.pageRank(e, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == pr)
  }

  test("ppr: seeds outside the node set carry no mass; empty seed set all-zero") {
    val e = Seq((1L, 2L)).toDF("s", "d")
    // seed 99 is not a node: effective seed set is {1} only
    val out = Graph.personalizedPageRank(e, "s", "d",
      Seq(1L, 99L).toDF("id"), "id",
      iterations = 1, dampingPct = 85, totalScaled = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 150L, 2L -> 850L))
    val zero = Graph.personalizedPageRank(e, "s", "d",
      Seq(99L).toDF("id"), "id", iterations = 2, totalScaled = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero == Map(1L -> 0L, 2L -> 0L))
  }

  test("ppr: deterministic under repartitioning") {
    val e = (0L until 200L).map(i => (i, (i * 11 + 5) % 200)).toDF("s", "d")
    val seeds = (0L until 200L by 10L).toDF("id")
    val a = Graph.personalizedPageRank(e, "s", "d", seeds, "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.personalizedPageRank(
      e.repartition(13), "s", "d", seeds.repartition(7), "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  // ------------- C99: synchronous label-propagation communities

  test("lpa: two bridged triangles settle into two communities (hand-traced)") {
    // triangles {1,2,3} and {4,5,6}, bridge 3-4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("s", "d")
    val out = Graph.labelPropagation(e, "s", "d", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-rolled synchronous rounds (count DESC, label ASC):
    // r1: 1→2 2→1 3→1 4→3 5→4 6→4; r2: 1→1 2→1 3→1 4→4 5→3 6→3;
    // r3: 1→1 2→1 3→1 4→3 5→3 6→3
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    assert(Set(1L, 2L, 3L).map(out).size == 1)
    assert(Set(4L, 5L, 6L).map(out).size == 1)
    assert(out(1L) != out(4L))
  }

  test("lpa: a self-loop-only node keeps its own community, row retained") {
    val e = Seq((1L, 2L), (7L, 7L)).toDF("s", "d")
    val out = Graph.labelPropagation(e, "s", "d", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 7L))
    assert(out(7L) == 7L)
  }

  test("lpa: deterministic under repartitioning") {
    val e = (0L until 300L).map(i => (i, (i * 17 + 5) % 300)).toDF("s", "d")
    val a = Graph.labelPropagation(e, "s", "d").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.labelPropagation(e.repartition(11), "s", "d").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  // ------------------------------- C64: degree + reciprocity stats

  test("degree stats: out/in/reciprocal counts, isolated dst gets a row") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (3L, 3L))
      .toDF("s", "d")
    val out = Graph.degreeStats(e, "s", "d")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // duplicate edge (1,3) dedupes; self-loop (3,3) is its own reciprocal
    assert(out(1L) == ((2L, 1L, 1L))) // out: 2,3; in: 2→1; recip: 1↔2
    assert(out(2L) == ((1L, 1L, 1L)))
    assert(out(3L) == ((1L, 2L, 1L))) // out: self-loop; in: 1→3, 3→3
  }

  // --------------------- C65: conversation flattening + structure

  test("conversations: turns flatten in order with token counts") {
    val df = Seq(
      (1L, """[{"role":"user","content":"hello there"},""" +
        """{"role":"assistant","content":"hi"}]"""),
      (2L, "not json at all")
    ).toDF("conv_id", "j")
    val rows = Conversations.flatten(df, "conv_id", "j").collect()
    val good = rows.filter(_.getLong(0) == 1L)
      .map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(good.toSeq.sortBy(_._1) == Seq(
      (0, "user", "hello there", 2L), (1, "assistant", "hi", 1L)))
    // malformed JSON stays visible: one row, NULL turn_idx
    val bad = rows.filter(_.getLong(0) == 2L)
    assert(bad.length == 1 && bad.head.isNullAt(1))
  }

  test("conversations: stats flag broken alternation and empty convs") {
    val df = Seq(
      (1L, """[{"role":"user","content":"a"},""" +
        """{"role":"assistant","content":"b c"},""" +
        """{"role":"user","content":"d"}]"""),
      (2L, """[{"role":"user","content":"a"},{"role":"user","content":"b"}]"""),
      (3L, "broken")
    ).toDF("conv_id", "j")
    val out = Conversations.stats(df, "conv_id", "j")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))).toMap
    assert(out(1L) == ((3L, 2L, 1L, 4L, true)))
    assert(out(2L) == ((2L, 2L, 0L, 2L, false))) // user twice in a row
    assert(out(3L) == ((0L, 0L, 0L, 0L, false))) // unparseable
  }

  // ----------------------- C66: exact skew-safe curriculum ranking

  test("curriculum: matches the naive global window on random scores") {
    val rng = new scala.util.Random(7)
    val docs = (0L until 500L).map(i => (i, rng.nextInt(40).toLong))
      .toDF("id", "score")
    val out = Curation.curriculum(docs, "id", col("score"), 5,
      numBuckets = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val naive = docs
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score"), col("id"))).cast("long"))
      .withColumn("stage", expr("CAST(((rank - 1) * 5) div 500 AS INT)"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getInt(3))).toMap
    assert(out == naive) // heavy ties across bucket cuts still exact
  }

  // ----------------------- C68: product-quantization encoding

  test("pq: a vector equal to a centroid concat encodes to those codes") {
    // dim 8, m 2, sub 4: build the exact concat of (sub 0, code 3) and
    // (sub 1, code 1) centroids — distance 0 must win both subspaces
    val v = ((0 until 4).map(d => pqCen(0, d, 3)) ++
      (0 until 4).map(d => pqCen(1, d, 1))).map(_.toFloat).toArray
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val out = Similarity.pqEncode(df, "vec_id", "embedding", m = 2, k = 4)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(out == Map(0 -> 3, 1 -> 1))
  }

  test("pq: NULL and wrong-width vectors yield NULL codes, rows kept") {
    val good = Array.fill(8)(0.1f)
    val df = Seq((1L, good), (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
    val rows = Similarity.pqEncode(df, "vec_id", "embedding", m = 2, k = 4)
      .collect()
    assert(rows.length == 6) // one row per (vector, subspace), always
    assert(rows.filter(r => r.getLong(0) != 1L).forall(_.isNullAt(2)))
    assert(rows.filter(_.getLong(0) == 1L).forall(!_.isNullAt(2)))
  }

  test("pq: decode reconstructs within quantization error, exact on centroids") {
    val exact = ((0 until 4).map(d => pqCen(0, d, 2)) ++
      (0 until 4).map(d => pqCen(1, d, 0))).map(_.toFloat).toArray
    val df = Seq((7L, exact)).toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", m = 2, k = 4)
    val vec = Similarity.pqDecode(codes, "vec_id", m = 2, k = 4, dim = 8)
      .collect().head.getSeq[Double](1)
    // float-cast input reconstructs to the exact double centroids
    assert(vec.zip(exact).forall { case (d, f) =>
      math.abs(d - f.toDouble) < 1e-7 })
  }

  // ------------------- C67: per-stratum exact quantile trimming

  test("quantile trim: matches the naive per-stratum window rule") {
    val rng = new scala.util.Random(11)
    val docs = (0L until 400L)
      .map(i => (i, s"src${i % 3}", rng.nextInt(50).toLong))
      .toDF("id", "src", "len")
    val out = Curation.quantileTrim(docs, "id", "src", col("len"), 10, 90,
      numBuckets = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val naive = docs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("len"), col("id")))
        .cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("src"))))
      .filter(col("rank") > expr("(10 * n) div 100") &&
        col("rank") <= expr("(90 * n) div 100"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == naive)
  }

  test("quantile trim: boundary percents keep everything / nothing") {
    val docs = (0L until 50L).map(i => (i, "s", i)).toDF("id", "src", "len")
    val all = Curation.quantileTrim(docs, "id", "src", col("len"), 0, 100)
    assert(all.count() == 50L)
    val none = Curation.quantileTrim(docs, "id", "src", col("len"), 50, 50)
    assert(none.count() == 0L)
  }

  test("curriculum: stages are contiguous and near-equal") {
    val docs = (0L until 100L).map(i => (i, i)).toDF("id", "score")
    val out = Curation.curriculum(docs, "id", col("score"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // score == id here, so rank == id + 1 and stages cut at exact quarters
    assert(out.forall { case (id, rank, stage) =>
      rank == id + 1 && stage == (id * 4 / 100).toInt })
  }

  // ----------------------- C74: top anchor texts per link target

  test("anchor texts: distinct referrers, capped, anchor-ascending ties") {
    val edges = Seq(
      (1L, 9L, "docs"), (1L, 9L, "docs"),   // repeat from one page: counts once
      (2L, 9L, "docs"), (3L, 9L, "api"),
      (4L, 9L, "api"), (5L, 9L, "blog"),
      (6L, 9L, "zzz"),                       // rank-4 anchor, cut by topN=3
      (1L, 8L, "home")).toDF("src", "dst", "anchor")
    val out = Graph.anchorTexts(edges, "src", "dst", "anchor", topN = 3)
      .filter(col("dst") === 9L).orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
    // counts: docs=2, api=2, blog=1, zzz=1 → ties break on anchor asc
    assert(out.toSeq == Seq((1, "api", 2L), (2, "docs", 2L), (3, "blog", 1L)))
  }

  test("anchor texts: NULL and empty anchors carry no evidence") {
    val edges = Seq((1L, Some(9L), Some("x")), (2L, Some(9L), None),
      (3L, Some(9L), Some("")), (4L, None, Some("y")))
      .toDF("src", "dst", "anchor")
    val out = Graph.anchorTexts(edges, "src", "dst", "anchor", topN = 5)
      .collect()
    assert(out.length == 1 && out.head.getString(2) == "x")
  }
}
