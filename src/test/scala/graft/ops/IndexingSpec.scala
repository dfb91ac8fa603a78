package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec
import graft.functions.HashImpl

/** Unit coverage for the indexing/mixing layer (SURVEY §2 C69–C73):
  * PQ asymmetric-distance search, reciprocal-rank fusion, per-domain
  * capping, Bloom membership, and temperature mixing.
  */
class IndexingSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------- C96: standalone spherical k-means

  test("kmeans: two well-separated directions split into two clusters") {
    // Vectors along +x (ids 0-3) and +y (ids 4-7), slightly perturbed.
    // Cosine k-means with k=2 must put each direction in its own cell.
    val rows = (0L to 3L).map(i => (i, Array(1.0f, 0.01f * i))) ++
      (4L to 7L).map(i => (i, Array(0.01f * (i - 4), 1.0f)))
    val df = rows.toDF("id", "vec")
    val out = Similarity.kmeans(df, "id", "vec", k = 2, lloydIters = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val xCells = (0L to 3L).map(out(_)._1).toSet
    val yCells = (4L to 7L).map(out(_)._1).toSet
    assert(xCells.size == 1 && yCells.size == 1 && xCells != yCells)
    // cluster_n reports each row's own cluster size
    assert(out.values.forall(_._2 == 4L))
  }

  test("kmeans: cluster sizes sum to the corpus; every row assigned once") {
    val df = (0L until 60L)
      .map(i => (i, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat)))
      .toDF("id", "vec")
    val out = Similarity.kmeans(df, "id", "vec", k = 4).collect()
    assert(out.length == 60)
    assert(out.map(_.getLong(0)).distinct.length == 60)
    // Σ over distinct cells of cluster_n = N
    val perCell = out.map(r => r.getInt(1) -> r.getLong(2)).distinct
    assert(perCell.map(_._2).sum == 60L)
  }

  test("kmeans: deterministic under repartitioning (ExactAgg means)") {
    val df = (0L until 80L)
      .map(i => (i, Array.tabulate(6)(j => ((i * 13 + j * 5) % 17).toFloat)))
      .toDF("id", "vec")
    val a = Similarity.kmeans(df, "id", "vec", k = 5, lloydIters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Similarity.kmeans(df.repartition(13), "id", "vec",
      k = 5, lloydIters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b)
  }

  // ------------------------------------- C69: PQ ADC top-k search


  test("pq search: a query equal to a doc's centroid word ranks it first") {
    // doc 1 IS the concat of (sub0, code2) and (sub1, code1) centroids;
    // doc 2 is a different word. Querying with doc 1's vector gives ADC
    // 0 to doc 1 — nothing can rank above it.
    val v1 = ((0 until 4).map(d => pqCen(0, d, 2)) ++
      (0 until 4).map(d => pqCen(1, d, 1))).map(_.toFloat).toArray
    val v2 = ((0 until 4).map(d => pqCen(0, d, 0)) ++
      (0 until 4).map(d => pqCen(1, d, 3))).map(_.toFloat).toArray
    val docs = Seq((1L, v1), (2L, v2)).toDF("id", "vec")
    val codes = Similarity.pqEncode(docs, "id", "vec", m = 2, k = 4)
    val q = Seq((100L, v1)).toDF("qid", "vec")
    val out = Similarity.pqSearch(codes, q, "id", "qid", "vec",
      m = 2, k = 4, dim = 8, topK = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(out.head.getLong(3) == 0L) // exact-centroid match: ADC = 0
  }

  test("pq search: docs with an incomplete code word are excluded") {
    val good = Array.fill(8)(0.25f)
    val docs = Seq((1L, good), (2L, Array(0.1f, 0.2f)),
      (3L, null.asInstanceOf[Array[Float]])).toDF("id", "vec")
    val codes = Similarity.pqEncode(docs, "id", "vec", m = 2, k = 4)
    val q = Seq((9L, good)).toDF("qid", "vec")
    val out = Similarity.pqSearch(codes, q, "id", "qid", "vec",
      m = 2, k = 4, dim = 8, topK = 10).collect()
    assert(out.map(_.getLong(2)).toSet == Set(1L))
  }

  test("pq wide layout: encode agrees with long layout; search identical") {
    // the production (wide) path and the long (sub, code) path must be
    // row-for-row interchangeable — they share pqCodeArray and the
    // scoring core, so any drift is a refactor bug
    val docs = Seq.tabulate(20) { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d) % 13) / 13.0f))
    }.toDF("id", "vec")
      .union(Seq((99L, null.asInstanceOf[Array[Float]])).toDF("id", "vec"))
    val long = Similarity.pqEncode(docs, "id", "vec", m = 2, k = 4)
    val wide = Similarity.pqEncodeWide(docs, "id", "vec", m = 2, k = 4)
    val longAsWide = long.groupBy("id")
      .agg(array_sort(collect_list(struct(col("sub"), col("code"))))
        .as("cs"))
      .select(col("id"), when(
        !array_contains(transform(col("cs"), t => t.getField("code").isNull),
          lit(true)),
        transform(col("cs"), t => t.getField("code"))).as("codes"))
    assert(wide.collect().map(r => (r.getLong(0), Option(r.getSeq[Int](1))))
      .toSet ==
      longAsWide.collect().map(r => (r.getLong(0), Option(r.getSeq[Int](1))))
        .toSet)
    val q = Seq((100L, Array.fill(8)(0.3f))).toDF("qid", "vec")
    val viaLong = Similarity.pqSearch(long, q, "id", "qid", "vec",
      m = 2, k = 4, dim = 8, topK = 5).collect().map(_.toSeq).toSet
    val viaWide = Similarity.pqSearchWide(wide, q, "id", "qid", "vec",
      m = 2, k = 4, dim = 8, topK = 5).collect().map(_.toSeq).toSet
    assert(viaLong == viaWide && viaWide.nonEmpty)
  }

  // ------------------------------- C70: reciprocal-rank fusion

  test("rrf: hand-computed fusion of two lists") {
    val l1 = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("q", "id", "r")
    val l2 = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("q", "id", "r")
    val out = Retrieval.rrfFuse(Seq(l1, l2), "q", "id", "r",
      k0 = 60, topK = 10, scale = 1000000L)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // 20: 1e6/62 + 1e6/61 = 16129 + 16393 = 32522 (2 lists)
    // 10: 1e6/61 = 16393; 30: 1e6/62 = 16129
    assert(out.toSeq == Seq((20L, 32522L, 2L), (10L, 16393L, 1L),
      (30L, 16129L, 1L)))
  }

  test("rrf: NULL ids and non-positive ranks carry no evidence") {
    val l = Seq((1L, Some(10L), 1), (1L, None, 2), (1L, Some(11L), 0))
      .toDF("q", "id", "r")
    val out = Retrieval.rrfFuse(Seq(l), "q", "id", "r").collect()
    assert(out.map(_.getLong(2)).toSet == Set(10L))
  }

  test("rrf: equal contributions tie toward the smaller id") {
    val l1 = Seq((1L, 50L, 3), (1L, 40L, 3)).toDF("q", "id", "r")
    val out = Retrieval.rrfFuse(Seq(l1), "q", "id", "r")
      .orderBy("rank").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(40L, 50L))
  }

  // --------------------------------- C71: per-domain capping

  test("domain cap: matches the window formulation, random scores") {
    val rng = new scala.util.Random(7)
    val rows = (0L until 300L).map(i => (i, s"d${i % 4}", rng.nextInt(40)))
    val df = rows.toDF("id", "dom", "sc")
    val out = Curation.domainCap(df, "id", "dom", col("sc").cast("double"), 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val naive = df.withColumn("rank", row_number().over(
        Window.partitionBy(col("dom"))
          .orderBy(col("sc").desc, col("id"))))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getString(1), r.getInt(3), r.getLong(0))).toSet
    assert(out == naive)
  }

  test("domain cap: NULL domain is a group; NULL score rows are dropped") {
    val df = Seq((1L, Option("a"), Some(5)), (2L, None, Some(9)),
      (3L, None, Some(1)), (4L, Option("a"), None))
      .toDF("id", "dom", "sc")
    val out = Curation.domainCap(df, "id", "dom", col("sc").cast("double"), 1)
      .collect().map(r => (Option(r.getString(0)), r.getLong(2))).toSet
    assert(out == Set((Some("a"), 1L), (None, 2L)))
  }

  // ------------------------------- C72: Bloom membership filter

  test("bloom: no false negatives; JVM and Column probes agree") {
    val keys = (0 until 200).map(i => s"key-$i")
    val corpus = keys.toDF("k")
    val bf = Sketches.bloomBuild(corpus, "k", numBits = 1 << 12, numHashes = 5)
    val probes = (0 until 400).map(i => s"key-$i").toDF("k")
    val got = Sketches.bloomMightContain(bf, probes, "k")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // members always true
    assert(keys.forall(got(_)))
    // set-logic reference from the SAME JVM positions the agg used
    val set = keys.flatMap(k =>
      (0 until 5).map(i => HashImpl.bloomPos(i, k, 1 << 12))).toSet
    (0 until 400).map(i => s"key-$i").foreach { k =>
      val expect = (0 until 5).forall(i => set(HashImpl.bloomPos(i, k, 1 << 12)))
      assert(got(k) == expect, s"mismatch for $k")
    }
  }

  test("bloom: NULL keys set no bits and probe to NULL") {
    val corpus = Seq(Option("a"), None).toDF("k")
    val bf = Sketches.bloomBuild(corpus, "k", numBits = 64, numHashes = 2)
    val bits = bf.bitmap.collect().head.getSeq[Long](0)
    val expected = (0 until 2).map(i => HashImpl.bloomPos(i, "a", 64))
      .foldLeft(0L)((acc, p) => acc | (1L << p))
    assert(bits.head == expected) // only "a"'s bits — NULL added none
    val out = Sketches.bloomMightContain(bf,
      Seq(Option("a"), None).toDF("k"), "k").collect()
    assert(out.find(_.getString(0) == "a").get.getBoolean(1))
    assert(out.find(_.isNullAt(0)).get.isNullAt(1))
  }

  test("bloom: merge across partitions ORs bitmaps (repartition-invariant)") {
    val keys = (0 until 500).map(i => s"m$i")
    val one = Sketches.bloomBuild(keys.toDF("k").coalesce(1), "k", 1 << 10, 3)
    val many = Sketches.bloomBuild(keys.toDF("k").repartition(13), "k", 1 << 10, 3)
    assert(one.bitmap.collect().head.getSeq[Long](0) ==
      many.bitmap.collect().head.getSeq[Long](0))
  }

  // --------------------------- C73: temperature-based source mixing

  test("temperature mix: plain-Scala reference agrees row for row") {
    // skewed strata: 160 / 30 / 10
    val rows = (0L until 200L).map { i =>
      val s = if (i < 160) "big" else if (i < 190) "mid" else "tiny"
      (i, s)
    }
    val df = rows.toDF("id", "src")
    val out = Sampling.temperatureMix(df, "id", "src", budget = 60L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // reference: identical fold order and op chain
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sumW = counts.toSeq.sortBy(_._1).foldLeft(0.0) {
      case (acc, (_, n)) => acc + math.sqrt(n.toDouble)
    }
    def p(n: Long): Double =
      math.min(1.0, 60L.toDouble * math.sqrt(n.toDouble) / sumW / n.toDouble)
    def frac(id: Long): Double = {
      val hex = HashImpl.md5Hex(id.toString.getBytes("UTF-8")).substring(0, 8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val expect = rows.filter { case (i, s) => frac(i) < p(counts(s)) }
      .map { case (i, s) =>
        i -> math.floor(p(counts(s)) * 1e12).toLong
      }.toMap
    assert(out == expect)
    // τ=1/2 upweights small strata: tiny keeps a larger fraction of
    // itself than big
    assert(p(10) > p(160))
  }

  // ------------------- C76: random-projection dim reduction

  test("random projection: plain-Scala fold agrees; NULL/width rows kept") {
    def plane(j: Int, d: Int): Double =
      HashImpl.hashUnit(s"rp$j:$d".getBytes("UTF-8"))
    val v = Array(0.5f, -0.25f, 0.125f, 1.0f)
    val df = Seq((1L, v), (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(1.0f))).toDF("id", "vec")
    val out = Similarity.randomProject(df, "id", "vec", outDim = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out(2L) == null && out(3L) == null) // rows kept, NULL proj
    val expect = (0 until 3).map { j =>
      var acc = 0.0
      for (d <- 0 until 4) acc += v(d).toDouble * plane(j, d)
      math.floor(acc * 1e6).toLong
    }
    assert(out(1L).toSeq == expect)
  }

  // ------------------ C77: deterministic shuffle + shard assignment

  test("shuffle shards: matches the naive per-shard window, exhaustive pos") {
    val docs = (0L until 500L).map(Tuple1(_)).toDF("id")
    val out = Curation.shuffleShards(docs, "id", numShards = 4,
      numBuckets = 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    def h(tag: String, id: Long, w: Int): Long = java.lang.Long.parseLong(
      graft.functions.HashImpl.md5Hex(s"$tag:$id".getBytes("UTF-8"))
        .substring(0, w), 16)
    val expect = (0L until 500L).map { i => (i, h("shard", i, 8) % 4, h("pos", i, 13)) }
      .groupBy(_._2).flatMap { case (shard, rows) =>
        rows.sortBy(r => (r._3, r._1)).zipWithIndex.map {
          case ((id, s, _), p) => id -> (s.toInt, p.toLong)
        }
      }.toMap
    assert(out == expect)
    // per-shard positions are contiguous 0..n-1
    out.values.groupBy(_._1).foreach { case (_, ps) =>
      assert(ps.map(_._2).toSeq.sorted == (0L until ps.size).toSeq)
    }
  }

  test("shuffle shards: NULL ids are excluded; ordering is input-invariant") {
    val a = Seq(Some(1L), Some(2L), None).map(Tuple1(_)).toDF("id")
    val out = Curation.shuffleShards(a, "id", 2)
    assert(out.count() == 2)
    val shuffled = Curation.shuffleShards(
      a.orderBy(col("id").desc).repartition(7), "id", 2)
    assert(out.collect().toSet == shuffled.collect().toSet)
  }

  test("temperature mix: zero budget keeps nothing; empty input is empty") {
    val df = Seq((1L, "a")).toDF("id", "src")
    assert(Sampling.temperatureMix(df, "id", "src", 0L).count() == 0L)
    assert(Sampling.temperatureMix(df.limit(0), "id", "src", 10L).count() == 0L)
  }
}
