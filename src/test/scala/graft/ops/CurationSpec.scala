package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit coverage for [[Curation]] (SURVEY §2 C36–C38): unit splitting
  * totality, newline-unit boilerplate removal on multi-line fixtures,
  * the leak-safe-split no-straddle property, and token-budget prefix
  * determinism.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- unit splitting

  // ---------------- C98: URL canonicalization + domain blocklist

  test("canonicalizeUrls: hand cases — case, www, tracking, fragment, slash") {
    val cases = Seq(
      1L -> "HTTPS://WWW.Example.COM/Path/Page?utm_source=x&id=7&ref=tw#frag",
      2L -> "http://example.com/",
      3L -> "https://sub.Example.com/A/B/",
      4L -> "https://example.com/?utm_campaign=spring",
      5L -> "http://www.example.com/p?id=1&utm_medium=email&x=2",
      6L -> "https://example.com//",
      7L -> "not a url at all",
      // "ref" must only match as a whole key: href is a legitimate param
      8L -> "https://example.com/p?href=keep&ref=drop")
    val out = Curation.canonicalizeUrls(cases.toDF("id", "url"), "url")
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    assert(out(1L) == ("https://example.com/Path/Page?id=7", "example.com"))
    assert(out(2L) == ("http://example.com", "example.com"))
    // path case preserved; trailing slash stripped; subdomain kept in
    // the canonical URL but NOT in the registered domain
    assert(out(3L) == ("https://sub.example.com/A/B", "example.com"))
    // query reduced to nothing: dangling '?' tidied, then '/' stripped
    assert(out(4L) == ("https://example.com", "example.com"))
    assert(out(5L) == ("http://example.com/p?id=1&x=2", "example.com"))
    // '//' is never halved
    assert(out(6L) == ("https://example.com//", "example.com"))
    // unparseable: canon is the input (nothing matched), domain empty
    assert(out(7L)._2 == "")
    assert(out(8L)._1 == "https://example.com/p?href=keep")
  }

  test("canonicalizeUrls: idempotent — a canonical URL is its own canonical form") {
    // the defining property of a canonicalizer: canon(canon(x)) == canon(x).
    // Messy inputs spanning every rule (case, www, tracking at each
    // position, fragments, trailing slashes, unparseable).
    val messy = Seq(
      "HTTPS://WWW.A.COM/P/Q?utm_source=x&id=1&ref=t#f",
      "http://b.org/", "https://C.Net//x/?gclid=9",
      "ftp://Weird.Host/Dir/", "no scheme here",
      "https://d.io/p?a=1&utm_b=2&c=3") ++
      (0 until 50).map(i =>
        s"HtTp://WwW.s$i.CoM/Path-$i/?utm_c$i=v&id=$i#frag$i")
    val once = Curation.canonicalizeUrls(
      messy.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url"),
      "url").select(col("id"), col("url_canon"), col("url_domain"))
    val twice = Curation.canonicalizeUrls(
      once.select(col("id"), col("url_canon").as("url")), "url")
      .select(col("id"), col("url_canon"), col("url_domain"))
    val a = once.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2))).toMap
    val b = twice.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2))).toMap
    assert(a == b)
  }

  test("canonicalizeUrls: NULL url yields NULL outputs, row kept") {
    val df = Seq((1L, "https://a.com/x"), (2L, null))
      .toDF("id", "url")
    val out = Curation.canonicalizeUrls(df, "url").collect()
      .map(r => r.getLong(0) -> (r.isNullAt(2), r.isNullAt(3))).toMap
    assert(out(1L) == (false, false))
    assert(out(2L) == (true, true))
  }

  test("filterBlockedDomains: anti-join drops blocked, keeps NULL domains") {
    val df = Seq((1L, "bad.com"), (2L, "good.com"), (3L, null))
      .toDF("id", "dom")
    val block = Seq("bad.com").toDF("domain")
    val kept = Curation.filterBlockedDomains(df, "dom", block, "domain")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  // ---------------- C105: per-stratum sequence packing

  test("packSequencesByStratum: matches the naive per-group window; offsets restart") {
    val rows = (0L until 300L).map(i =>
      (i, s"s${i % 4}", ((i * 13 + 7) % 90) + 1))
    val df = rows.map { case (i, s, n) => (i, s, n) }.toDF("id", "src", "tok")
    val fast = Curation.packSequencesByStratum(df, "id", "src",
      col("tok"), seqLen = 100, numBuckets = 8)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // naive: running sums per group in id order
    val naive = rows.groupBy(_._2).values.flatMap { grp =>
      val sorted = grp.sortBy(_._1)
      sorted.zip(sorted.scanLeft(0L)(_ + _._3)).map { case ((i, _, n), off) =>
        i -> (off, off / 100, (off + math.max(n, 1) - 1) / 100)
      }
    }.toMap
    assert(fast == naive)
    // each stratum's stream starts at 0
    val bySrc = rows.groupBy(_._2).view
      .mapValues(g => fast(g.map(_._1).min)._1)
    assert(bySrc.values.forall(_ == 0L))
  }

  test("packSequencesByStratum: NULL stratum packs as its own group") {
    val df = Seq((1L, Some("a"), 60L), (2L, None, 70L), (3L, None, 80L))
      .toDF("id", "src", "tok")
    val out = Curation.packSequencesByStratum(df, "id", "src",
      col("tok"), seqLen = 100)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) == 0L && out(2L) == 0L && out(3L) == 70L)
  }

  // ---------- C104: rendezvous (highest-random-weight) sharding

  test("rendezvousShard: k -> k+1 moves docs ONLY to the new shard") {
    // the defining HRW property, exact not statistical: a doc's scores
    // against shards 0..k-1 are unchanged when shard k appears, so it
    // either keeps its argmax or the new shard beat it
    val df = (0L until 4000L).toDF("id")
    val k8 = Curation.rendezvousShard(df, "id", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val k9 = Curation.rendezvousShard(df, "id", 9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val moved = (0L until 4000L).filter(i => k8(i) != k9(i))
    assert(moved.forall(i => k9(i) == 8),
      s"moved docs must land on the NEW shard: ${moved.take(3).map(k9)}")
    // expected movement ~ 1/9 of docs; allow wide slack, it's md5-random
    assert(moved.size > 4000 / 20 && moved.size < 4000 / 4,
      s"moved ${moved.size} of 4000")
  }

  test("rendezvousShard: balanced-ish spread, NULL id -> NULL shard") {
    val df = (0L until 3200L).map(Option(_)).:+(None: Option[Long]).toDF("id")
    val rows = Curation.rendezvousShard(df, "id", 16).collect()
    val byShard = rows.filter(!_.isNullAt(1)).groupBy(_.getInt(1))
      .view.mapValues(_.length).toMap
    assert(byShard.keySet == (0 until 16).toSet)
    // 200 expected per shard; no shard beyond 2x or below half
    assert(byShard.values.forall(n => n > 100 && n < 400), byShard.toString)
    assert(rows.exists(_.isNullAt(1)))
  }

  // -------------- C103: MAD robust outliers (Hampel's rule)

  test("madOutliers: hand-computed medians and flags; outlier can't hide itself") {
    // stratum a: values 10,12,14,16,1000 -> lower median 14 (rank 3),
    // devs 4,2,0,2,986 -> MAD = 2 (rank 3 of 0,2,2,4,986);
    // 1000 flags (986 > 3*2); nothing else does. The 1000 would drag a
    // MEAN to ~210 and a stddev past 400 — a z-score rule would keep it.
    val df = Seq((1L, "a", 10L), (2L, "a", 12L), (3L, "a", 14L),
      (4L, "a", 16L), (5L, "a", 1000L)).toDF("id", "src", "v")
    val out = Curation.madOutliers(df, "id", "src", "v", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(out(3L) == (14L, 0L, 2L, false))
    assert(out(5L) == (14L, 986L, 2L, true))
    assert(out.values.count(_._4) == 1)
  }

  test("madOutliers: strata are independent; NULL stratum is a group") {
    val df = Seq((1L, Some("a"), 5L), (2L, Some("a"), 5L), (3L, Some("a"), 50L),
      (4L, None, 7L), (5L, None, 7L), (6L, None, 7L))
      .toDF("id", "src", "v")
    val out = Curation.madOutliers(df, "id", "src", "v", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(5), r.getBoolean(6))).toMap
    // a: med 5, devs (0,0,45), MAD 0 -> 45 > 0 flags
    assert(out(3L) == (0L, true))
    // NULL stratum: all equal, MAD 0, dev 0 -> 0 > 0 false
    assert(Seq(4L, 5L, 6L).forall(i => out(i) == (0L, false)))
  }

  test("madOutliers: matches a naive percentile_disc formulation on random data") {
    val rows = (0L until 200L).map { i =>
      (i, s"s${i % 3}", ((i * 37 + 11) % 97) + (if (i % 50 == 0) 500L else 0L))
    }
    val df = rows.toDF("id", "src", "v")
    val fast = Curation.madOutliers(df, "id", "src", "v", k = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    // naive: per-stratum lower median via sorted seq
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size - 1) / 2)
    val bySrc = rows.groupBy(_._2)
    val naive = rows.map { case (id, s, v) =>
      val vs = bySrc(s).map(_._3)
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(x => math.abs(x - med)))
      id -> (math.abs(v - med) > 3L * mad)
    }.toMap
    assert(fast == naive)
  }

  test("madOutliers: all three extraction tiers agree (driver/flat/two-level)") {
    // production data selects the tier by histogram row count; force
    // each tier via the threshold seam and pin identical full outputs —
    // ties, NULL stratum, and repeated values included
    val rows = (0L until 300L).map { i =>
      (i, if (i % 7 == 0) null else s"s${i % 4}",
        ((i * 29 + 3) % 41) + (if (i % 60 == 0) 900L else 0L))
    }
    val df = rows.toDF("id", "src", "v")
    def run(driverMax: Long, flatMax: Long) =
      Curation.madOutliersImpl(df, "id", "src", "v", 3, 8, driverMax, flatMax)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
        .toMap
    val driver = run(Long.MaxValue, Long.MaxValue)
    val flat = run(0L, Long.MaxValue)
    val twoLevel = run(0L, 0L)
    assert(driver == flat, "driver tier != flat-window tier")
    assert(driver == twoLevel, "driver tier != two-level tier")
  }

  // -------------- C102: data-constrained epoch allocation

  test("epochAllocation: repeat + proportional leftover, hand-computed") {
    val df = Seq(("a", 100L), ("b", 300L)).toDF("src", "tok")
    val out = Curation.epochAllocation(df, "src", "tok", budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // U=400, epochs=2, rem=200: extra a=100*200/400=50, b=150
    assert(out("a") == (100L, 2L, 50L, 250L))
    assert(out("b") == (300L, 2L, 150L, 750L))
    // exact budget fill when divisions are exact
    assert(out.values.map(_._4).sum == 1000L)
  }

  test("epochAllocation: subsample branch when budget < unique mass") {
    val df = Seq(("a", 100L), ("b", 300L)).toDF("src", "tok")
    val out = Curation.epochAllocation(df, "src", "tok", budget = 200L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(out("a") == (0L, 50L) && out("b") == (0L, 150L))
  }

  test("epochAllocation: the epoch cap leaves budget on the table, auditable") {
    val df = Seq(("a", 100L), ("b", 300L)).toDF("src", "tok")
    val out = Curation.epochAllocation(df, "src", "tok",
      budget = 10000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == (4L, 0L, 400L))
    assert(out("b") == (4L, 0L, 1200L))
  }

  test("epochAllocation: zero-mass corpus allocates zero, never the cap") {
    // least() skips NULLs — an unguarded NULL total would silently
    // return the epoch cap for a corpus with no token mass at all
    val df = Seq(("a", None: Option[Long]), ("b", None)).toDF("src", "tok")
    val out = Curation.epochAllocation(df, "src", "tok", budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == (0L, 0L, 0L, 0L))
    assert(out("b") == (0L, 0L, 0L, 0L))
  }

  test("epochAllocation: NULL source is a group; NULL tokens carry no mass") {
    val df = Seq((Some("a"), Some(100L)), (None, Some(60L)),
      (Some("a"), None)).toDF("src", "tok")
    val out = Curation.epochAllocation(df, "src", "tok", budget = 160L)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(4)).toMap
    // U=160, budget=160 -> epochs=1, rem=0
    assert(out(Some("a")) == 100L)
    assert(out(None) == 60L)
  }

  test("segmentUnits: every doc yields >=1 unit and reassembly is total") {
    val df = Seq(
      (1L, "a b c d e f g h i j k"), // 11 tokens -> 3 units of width 5
      (2L, "a b c d e"),             // exactly one full unit
      (3L, "a"),                     // shorter than width
      (4L, ""))                      // empty -> still one unit
      .toDF("doc_id", "text")
    val out = df.select($"doc_id", Curation.segmentUnits($"text", 5).as("units"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c d e", "f g h i j", "k"))
    assert(out(2L) == Seq("a b c d e"))
    assert(out(3L) == Seq("a"))
    assert(out(4L).length == 1) // empty text still yields one unit
    // totality: rejoining the units recovers the normalized token stream
    val rejoined = df.select($"doc_id",
      array_join(Curation.segmentUnits($"text", 5), " ").as("back"),
      array_join(TextOps.tokens($"text"), " ").as("orig"))
      .collect()
    rejoined.foreach(r => assert(r.getString(1) == r.getString(2)))
  }

  test("lineUnits splits on newlines preserving order and blank lines") {
    val units = Seq(("nav\nbody text\n\nfooter"))
      .toDF("text").select(Curation.lineUnits($"text"))
      .collect().head.getSeq[String](0)
    assert(units == Seq("nav", "body text", "", "footer"))
  }

  // --------------------------------------------------- boilerplate removal

  test("removeBoilerplate strips repeated newline units, keeps unique body") {
    // Three pages of site A share a nav bar and footer; their bodies are
    // unique. Site B has the same literal nav line but only one page, so
    // B's nav must survive (grouping is per-site).
    val df = Seq(
      (1L, "A", "HOME | ABOUT\npage one body\n(c) site A"),
      (2L, "A", "HOME | ABOUT\npage two body\n(c) site A"),
      (3L, "A", "HOME | ABOUT\npage three body\n(c) site A"),
      (4L, "B", "HOME | ABOUT\nlonely page body"))
      .toDF("doc_id", "site", "text")
    val out = Curation.removeBoilerplate(
        df, "doc_id", "site", Curation.lineUnits($"text"), minDocs = 3, sep = "\n")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Int]("n_units"),
          r.getAs[Int]("n_removed")))).toMap
    assert(out(1L) == (("page one body", 3, 2)))
    assert(out(2L) == (("page two body", 3, 2)))
    assert(out(3L) == (("page three body", 3, 2)))
    assert(out(4L) == (("HOME | ABOUT\nlonely page body", 2, 0))) // other group untouched
  }

  test("removeBoilerplate: doc made entirely of boilerplate survives as empty row") {
    val df = Seq(
      (1L, "A", "nav\nbody"), (2L, "A", "nav\nother"), (3L, "A", "nav"))
      .toDF("doc_id", "site", "text")
    val out = Curation.removeBoilerplate(
        df, "doc_id", "site", Curation.lineUnits($"text"), minDocs = 3, sep = "\n")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Int]("n_removed")))).toMap
    assert(out.size == 3)           // no rows dropped
    assert(out(3L) == (("", 1)))    // all-boilerplate doc kept, empty text
    assert(out(1L) == (("body", 1)))
  }

  test("removeBoilerplate: repeats inside ONE doc are not boilerplate evidence") {
    val df = Seq(
      (1L, "A", "echo\necho\necho\nunique one"),
      (2L, "A", "unique two"))
      .toDF("doc_id", "site", "text")
    val out = Curation.removeBoilerplate(
        df, "doc_id", "site", Curation.lineUnits($"text"), minDocs = 2, sep = "\n")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_removed")).toMap
    assert(out(1L) == 0 && out(2L) == 0) // "echo" appears in only 1 distinct doc
  }

  test("removeBoilerplate rejects minDocs < 2") {
    val df = Seq((1L, "A", "x")).toDF("doc_id", "site", "text")
    assertThrows[IllegalArgumentException](
      Curation.removeBoilerplate(df, "doc_id", "site", Curation.lineUnits($"text"), 1))
  }

  // ------------------------------------------------------ leak-safe split

  test("leakSafeSplit: near-duplicate pairs never straddle a split boundary") {
    // clusters: {1,2,3} (chain), {10,11}; singletons 20..40
    val docs = (Seq(1L, 2L, 3L, 10L, 11L) ++ (20L to 40L)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Curation.leakSafeSplit(docs, "doc_id", pairs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster"), r.getAs[String]("split")))).toMap
    assert(out.size == 26)
    // no-straddle: every member of a cluster lands in the same split
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(out(1L)._1 == 1L)
    assert(out(10L) == out(11L))
    // determinism: same inputs -> identical assignment
    val again = Curation.leakSafeSplit(docs, "doc_id", pairs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(out.map { case (k, v) => k -> v._2 } == again)
    // split labels are from the expected set
    assert(out.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("leakSafeSplit validates percentage arguments") {
    val docs = Seq(1L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assertThrows[IllegalArgumentException](
      Curation.leakSafeSplit(docs, "doc_id", pairs, trainPct = 90, valPct = 10))
  }

  // ------------------------------------------------------- token budgets

  test("tokenBudget differential: bucketed prefix equals the flat stratum window") {
    import org.apache.spark.sql.expressions.Window
    // heavy first-priority ties (few distinct qualities) spanning bucket
    // cut points — the case where a non-tie-sharing bucket assignment
    // would break the prefix — plus a null-quality doc per stratum
    // (desc -> nulls last).
    for (seed <- Seq(7, 99)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 500).map { i =>
        val q: java.lang.Double =
          if (i % 50 == 0) null else (rnd.nextInt(5) / 10.0): java.lang.Double
        (i.toLong, s"s${i % 3}", q, (rnd.nextInt(20) + 1).toLong)
      }
      val df = rows.toDF("doc_id", "src", "quality", "ntok")
      val priority = Seq($"quality".desc, $"doc_id")
      val fast = Curation.tokenBudget(df, "src", $"ntok", 700L, priority,
        numBuckets = 8)
        .select($"doc_id", $"cum_tokens")
      val naive = df.withColumn("cum_tokens",
          sum($"ntok").over(Window.partitionBy($"src").orderBy(priority: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter($"cum_tokens" <= 700L)
        .select($"doc_id", $"cum_tokens")
      assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
        s"seed $seed: two-level budget prefix must equal the flat window")
    }
  }

  test("tokenBudget honors non-default null ordering and NaN priorities") {
    import org.apache.spark.sql.expressions.Window
    // Regression: the bucket key must carry the priority's null
    // ordering and survive NaN. desc_nulls_first puts null-quality docs
    // at the FRONT of the priority order (bucket 0, not last); NaN
    // (which Spark sorts as the largest double -> first under desc)
    // must also land in bucket 0 — the old negated key sent both to the
    // last bucket and corrupted every cum_tokens after them.
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map { i =>
      val q: java.lang.Double =
        if (i % 17 == 0) null
        else if (i % 23 == 0) Double.NaN
        else (rnd.nextInt(7) / 10.0): java.lang.Double
      (i.toLong, s"s${i % 2}", q, (rnd.nextInt(9) + 1).toLong)
    }
    val df = rows.toDF("doc_id", "src", "quality", "ntok")
    for (priority <- Seq(
        Seq($"quality".desc_nulls_first, $"doc_id"),
        Seq($"quality".desc, $"doc_id"),
        Seq($"quality".asc_nulls_last, $"doc_id"))) {
      val fast = Curation.tokenBudget(df, "src", $"ntok", 400L, priority,
        numBuckets = 8).select($"doc_id", $"cum_tokens")
      val naive = df.withColumn("cum_tokens",
          sum($"ntok").over(Window.partitionBy($"src").orderBy(priority: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter($"cum_tokens" <= 400L)
        .select($"doc_id", $"cum_tokens")
      assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
        s"priority $priority: bucketed budget must equal the flat window")
    }
  }

  // ----------------------------------------------------- sequence packing

  test("quantile bucketing balances pathologically clustered ids") {
    // Two dense runs 2^60 apart (hash-derived id shape): fixed-width
    // id-range bucketing would land everything in 2 of 64 buckets; the
    // quantile cuts must spread them evenly regardless of the gap.
    for (seed <- Seq(3, 21)) {
      val rnd = new scala.util.Random(seed)
      val lowBase = rnd.nextLong() % (1L << 20)
      val ids = ((0 until 5000).map(i => lowBase + i) ++
        (0 until 5000).map(i => (1L << 60) + lowBase + i * 3L)).map(_.toLong)
      val df = ids.toDF("doc_id")
      val sizes = Bucketing.quantileBuckets(df, $"doc_id", Nil, 64)
        .groupBy(col(Bucketing.BucketCol)).count()
        .collect().map(_.getLong(1))
      assert(sizes.length > 32,
        s"seed $seed: most of the 64 buckets must be used, got ${sizes.length}")
      assert(sizes.max <= ids.length / 64 * 4,
        s"seed $seed: worst bucket ${sizes.max} of ${ids.length} rows is skewed")
    }
  }

  test("packSequences equals the single-window global prefix sum") {
    // sparse, non-contiguous ids across many buckets; token counts chosen
    // so docs span/share sequence boundaries (seqLen 10)
    val rows = Seq(1L -> 7L, 2L -> 7L, 5L -> 10L, 90L -> 1L, 91L -> 1L,
      1000L -> 25L, 5000L -> 3L)
    val df = rows.toDF("doc_id", "ntok")
    val out = Curation.packSequences(df, "doc_id", $"ntok", seqLen = 10,
        numBuckets = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("start_offset"), r.getAs[Long]("first_seq"),
          r.getAs[Long]("last_seq")))).toMap
    // expected: the plain cumulative layout
    var off = 0L
    val expected = rows.sortBy(_._1).map { case (id, n) =>
      val e = (id, (off, off / 10, (off + n - 1) / 10)); off += n; e
    }.toMap
    assert(out == expected)
    // spot-check semantics: doc 2 starts mid-sequence 0 and spills into 1
    assert(out(2L) == ((7L, 0L, 1L)))
    // doc 1000: 25 tokens from offset 26 occupy positions 26..50, i.e.
    // sequences 2 through 5
    assert(out(1000L) == ((26L, 2L, 5L)))
    // bucket count larger than doc count must also work
    val wide = Curation.packSequences(df, "doc_id", $"ntok", 10, numBuckets = 1000)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("start_offset"), r.getAs[Long]("first_seq"),
          r.getAs[Long]("last_seq")))).toMap
    assert(wide == expected)
  }

  test("packSequences differential: random corpora match the naive global window") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(11, 42, 1337)) {
      val rnd = new scala.util.Random(seed)
      // clustered + negative + far-flung ids, including adjacent runs
      val ids = (Seq.fill(200)(rnd.nextLong() % 100000L) ++
        (0L until 50L) ++ Seq(Long.MinValue / 2, Long.MaxValue / 2)).distinct
      val rows = ids.map(id => (id, (math.abs(id) % 97) + rnd.nextInt(5).toLong))
      val df = rows.toDF("doc_id", "ntok")
      val fast = Curation.packSequences(df, "doc_id", $"ntok", seqLen = 7,
          numBuckets = 16)
        .select($"doc_id", $"start_offset", $"first_seq", $"last_seq")
      val naive = df
        .withColumn("start_offset",
          coalesce(sum($"ntok").over(Window.orderBy($"doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select($"doc_id", $"start_offset",
          expr("start_offset div 7").as("first_seq"),
          expr("(start_offset + greatest(ntok, 1L) - 1) div 7").as("last_seq"))
      assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
        s"seed $seed: two-level prefix sum must equal the naive window")
    }
  }

  test("packSequences: full-range ids don't collapse buckets; null ids excluded") {
    // hi - lo overflows a long here: the BigInt width math must keep
    // bucketing sane instead of one-bucket-per-doc
    val df = Seq(
      (java.lang.Long.valueOf(Long.MinValue), 5L),
      (java.lang.Long.valueOf(-1L), 3L),
      (java.lang.Long.valueOf(0L), 2L),
      (java.lang.Long.valueOf(Long.MaxValue), 7L),
      (null.asInstanceOf[java.lang.Long], 9L)) // no position -> excluded
      .toDF("doc_id", "ntok")
    val out = Curation.packSequences(df, "doc_id", $"ntok", seqLen = 10,
        numBuckets = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("start_offset"), r.getAs[Long]("first_seq"),
          r.getAs[Long]("last_seq")))).toMap
    assert(out.size == 4)
    assert(out(Long.MinValue) == ((0L, 0L, 0L)))
    assert(out(-1L) == ((5L, 0L, 0L)))
    assert(out(0L) == ((8L, 0L, 0L)))
    assert(out(Long.MaxValue) == ((10L, 1L, 1L)))
  }

  test("packSequences: empty input yields empty output, zero-token docs take no space") {
    val empty = Curation.packSequences(
      Seq.empty[(Long, Long)].toDF("doc_id", "ntok"), "doc_id", $"ntok", 10)
    assert(empty.count() == 0)
    val out = Curation.packSequences(
        Seq(1L -> 4L, 2L -> 0L, 3L -> 4L).toDF("doc_id", "ntok"),
        "doc_id", $"ntok", 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("start_offset"), r.getAs[Long]("first_seq"),
          r.getAs[Long]("last_seq")))).toMap
    assert(out(2L) == ((4L, 0L, 0L))) // zero-token doc: valid position, no space
    assert(out(3L) == ((4L, 0L, 0L))) // next doc starts at the same offset
  }

  test("tokenBudget keeps a deterministic priority-order prefix per stratum") {
    val df = Seq(
      // stratum S: quality desc, id asc -> d1(0.9,5), d2(0.8,4), d3(0.8,4), d4(0.1,4)
      (1L, "S", 0.9, 5L), (2L, "S", 0.8, 4L), (3L, "S", 0.8, 4L), (4L, "S", 0.1, 4L),
      // stratum T: single doc larger than budget -> dropped
      (5L, "T", 1.0, 99L))
      .toDF("doc_id", "src", "quality", "ntok")
    val out = Curation.tokenBudget(df, "src", $"ntok", budgetTokens = 13L,
        Seq($"quality".desc, $"doc_id"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cum_tokens")).toMap
    // prefix: 5 + 4 + 4 = 13 <= 13; d4 would push to 17 -> cut. T's doc: 99 > 13 -> cut.
    assert(out == Map(1L -> 5L, 2L -> 9L, 3L -> 13L))
    // tie-break on doc_id makes the prefix stable: re-run is identical
    val again = Curation.tokenBudget(df, "src", $"ntok", 13L,
        Seq($"quality".desc, $"doc_id"))
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(again.toSeq == Seq(1L, 2L, 3L))
  }

  // ----------------------------------- C75: leakage-safe k-fold CV

  test("k-fold: near-duplicates share a fold, singletons self-cluster") {
    val docs = (0L until 40L).map(i => Tuple1(i)).toDF("id")
    // 0-1-2 one cluster, 10-11 another
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster")
    val out = Curation.leakSafeKFold(docs, "id", clusters, k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(Set(out(0L), out(1L), out(2L)).size == 1) // same cluster+fold
    assert(out(10L) == out(11L))
    assert(out(7L)._1 == 7L)                          // singleton: own cluster
    assert(out.values.forall { case (_, f) => f >= 0 && f < 5 })
    // fold is a pure function of the cluster id: md5 first-8-hex mod k
    def fold(c: Long): Int = (java.lang.Long.parseLong(
      graft.functions.HashImpl.md5Hex(c.toString.getBytes("UTF-8"))
        .substring(0, 8), 16) % 5).toInt
    assert(out.values.forall { case (c, f) => f == fold(c) })
  }

  test("k-fold: requires at least two folds") {
    val docs = Seq(Tuple1(1L)).toDF("id")
    val clusters = Seq((1L, 1L)).toDF("id", "cluster")
    intercept[IllegalArgumentException] {
      Curation.leakSafeKFold(docs, "id", clusters, k = 1)
    }
  }

  test("interleaveMix: every prefix holds the weighted mixture") {
    // Stride scheduling's defining property: with weights A:3, B:1 the
    // (mix_key, stratum, id) order carries ~3 A's per B in EVERY
    // prefix — |count_s(k-prefix) − k·w_s/W| < 1 + strata. 12 A docs,
    // 4 B docs.
    val df = ((1L to 12L).map(i => (i, "A")) ++
      (101L to 104L).map(i => (i, "B"))).toDF("id", "src")
    val out = Curation.interleaveMix(df, "id", "src",
      Map("A" -> 3L, "B" -> 1L))
      .orderBy("mix_key", "src", "id").collect()
    assert(out.length == 16)
    // per-stratum ranks are a 1..n permutation
    val ranksA = out.filter(_.getString(1) == "A").map(_.getLong(2)).sorted
    assert(ranksA.toSeq == (1L to 12L))
    // mix_key = (rank * scale) div w, exactly
    assert(out.forall { r =>
      val w = if (r.getString(1) == "A") 3L else 1L
      r.getLong(3) == r.getLong(2) * 1000000L / w
    })
    // prefix proportionality
    for (k <- 1 to 16) {
      val nA = out.take(k).count(_.getString(1) == "A")
      assert(math.abs(nA - k * 0.75) < 3.0,
        s"prefix $k: $nA A's, expected ~${k * 0.75}")
    }
    // a stratum with no declared weight fails loudly (silent drop would
    // corrupt the declared mixture), as does a NULL stratum
    intercept[IllegalArgumentException] {
      Curation.interleaveMix(df, "id", "src", Map("A" -> 3L))
    }
    // NULL ids have no stable identity and are excluded
    val withNull = Seq((Some(1L), "A"), (None, "A")).toDF("id", "src")
    assert(Curation.interleaveMix(withNull, "id", "src", Map("A" -> 1L))
      .count() == 1L)
    // weights must be positive
    intercept[IllegalArgumentException] {
      Curation.interleaveMix(df, "id", "src", Map("A" -> 0L, "B" -> 1L))
    }
  }
}
