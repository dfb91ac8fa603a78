package graft.ops

import graft.SparkSpec

/** Differential specs: the distributed operators vs straight-line
  * single-machine reference implementations on seeded random inputs.
  * These catch whole-algorithm drift (wrong priority order, missed
  * pairs, off-by-one windows) that hand-picked fixtures can miss.
  */
class RetrievalDifferentialSpec extends SparkSpec {
  import spark.implicits._

  test("semDedup equals the brute-force reference on random vectors") {
    val rnd = new scala.util.Random(42)
    val dim = 8; val nCells = 4; val tau = 0.6
    val vecs = Array.tabulate(60)(i =>
      i.toLong -> Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat))
    val df = vecs.toSeq.toDF("vec_id", "embedding")

    // reference: same md5 centroids, argmax (sim, cell) with the
    // reverse(array_sort) tie-break = sim desc then cell desc
    val centroids = Similarity.hashCentroids(nCells, dim)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val assigned = vecs.map { case (id, v) =>
      val vd = v.map(_.toDouble)
      val best = centroids.map { case (c, cv) => (cos(vd, cv.toArray), c) }
        .maxBy { case (s, c) => (s, c) }
      (id, best._2, best._1, vd)
    }
    val dropped = assigned.filter { case (id, cell, csim, v) =>
      assigned.exists { case (id2, cell2, csim2, v2) =>
        cell2 == cell && (csim2 < csim || (csim2 == csim && id2 < id)) &&
          cos(v, v2) >= tau
      }
    }.map(_._1).toSet

    val out = Similarity.semDedup(df, "vec_id", "embedding", nCells, tau)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
    assert(out.length == 60)
    val sparkCells = out.map(t => t._1 -> t._2).toMap
    val refCells = assigned.map(t => (t._1, t._2)).toMap
    assert(sparkCells == refCells, "cell assignment drift")
    val sparkDropped = out.filter(!_._3).map(_._1).toSet
    assert(sparkDropped == dropped,
      s"pruning drift: spark-only ${sparkDropped -- dropped}, ref-only ${dropped -- sparkDropped}")
  }

  test("bm25 equals the naive reference scorer on a random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val queries = Seq((0, "ant dog"), (1, "hen"), (2, "cat elk fox"))
    val k1 = 1.2; val b = 0.75; val k = 7

    // naive reference: same formula, same tie-break, plain loops
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val expected = queries.flatMap { case (qid, qt) =>
      val terms = qt.split(" ").distinct
      val scored = docs.flatMap { case (did, _) =>
        val dl = toks(did).size.toDouble
        val contribs = terms.flatMap { term =>
          val tf = toks(did).count(_ == term).toDouble
          if (tf == 0) None else {
            val df = docs.count(d => toks(d._1).contains(term)).toDouble
            val idf = (n - df + 0.5) / (df + 0.5)
            val tfc = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
            Some(math.floor((idf * tfc) * 1e6).toLong)
          }
        }
        if (contribs.isEmpty) None
        else Some((did, contribs.sum, contribs.size.toLong))
      }
      scored.sortBy { case (did, s, _) => (-s, did) }.take(k)
        .zipWithIndex.map { case ((did, s, nt), r) => (qid, r + 1, did, s, nt) }
    }.toSet

    val qdf = queries.toDF("query_id", "qtext")
    val out = Retrieval.bm25(docs.toDF("doc_id", "text"), qdf,
      "doc_id", "text", "query_id", "qtext", k = k, k1 = k1, b = b)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == expected,
      s"spark-only ${out -- expected}, ref-only ${expected -- out}")
  }

  test("windowDupStats equals the naive reference on a random corpus") {
    val rnd = new scala.util.Random(99)
    val vocab = Vector("a", "b", "c", "d")
    val w = 3
    val docs = (0 until 30).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val windows = docs.flatMap { case (id, t) =>
      t.split(" ").toSeq.sliding(w).filter(_.size == w)
        .map(win => (id, win.mkString(" ")))
    }
    val occ = windows.groupBy(_._2).view.mapValues(_.size).toMap
    val expected = docs.map { case (id, _) =>
      val mine = windows.filter(_._1 == id)
      val nDup = mine.count(x => occ(x._2) > 1)
      (id, mine.size.toLong, nDup.toLong)
    }.toSet
    val out = Dedup.windowDupStats(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == expected)
  }
}
