package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.sources.Sources

/** Skew salting, IVF ANN, multi-format sources, partitioned writes. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join (inner and left)") {
    val facts = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"event_type", $"value")
    val dims = Seq(("click", 1.0), ("purchase", 10.0), ("view", 0.1))
      .toDF("event_type", "weight")
    for (jt <- Seq("inner", "left")) {
      val plain = facts.join(dims, Seq("event_type"), jt)
        .select($"event_id", $"weight").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      val salted = Skew.saltedJoin(facts, dims, "event_type", 8, jt)
        .select($"event_id", $"weight").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(salted == plain, s"join type $jt")
    }
  }

  test("salted two-phase aggregate equals direct aggregate") {
    val ev = Tables.load(spark, sfDir, "events")
    val direct = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSumCount(ev, "event_type", "value", 8)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    assert(salted == direct)
  }

  test("IVF ANN recall vs brute force is reasonable with multi-probe") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(q, e, "vec_id", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, e, "vec_id", "vec_id", "embedding",
      k = 5, numCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall=$recall") // 4/8 cells probed
    // every IVF hit must be a real vector pair (sanity)
    assert(ivf.forall { case (a, b) => a < 5 && b >= 0 })
  }

  test("weighted sampling clamps weights; rebalance hits the target mix and drops unnamed strata") {
    val d = (1L to 4000L).map(i =>
      (i, if (i % 4 == 0L) "en" else "xx")).toDF("doc_id", "lang")
    // weight > 1 keeps everything; weight <= 0 keeps nothing
    assert(Sampling.weightedSample(d, "doc_id", lit(7.5)).count() == 4000)
    assert(Sampling.weightedSample(d, "doc_id", lit(-1.0)).count() == 0)
    assert(Sampling.weightedSample(d, "doc_id", lit(Double.NaN)).count() == 0)

    // 1000 en / 3000 xx; target 50/50 of original N=4000 -> en rate
    // caps at 1 (no upsampling), xx rate = 2000/3000
    val kept = Sampling.rebalance(d, "doc_id", "lang",
      Map("en" -> 0.5, "xx" -> 0.5))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") == 1000) // rate 1.0: all kept
    assert(math.abs(kept("xx") - 2000) < 200) // ~2/3 of 3000, hash noise
    // a stratum absent from the target is dropped entirely
    val dropped = Sampling.rebalance(d, "doc_id", "lang", Map("en" -> 0.5))
    assert(dropped.filter($"lang" === "xx").count() == 0)
  }

  test("int8 quantization: error bounded by scale/2, ANN recall survives") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val quant = Similarity.quantizeInt8(e.select($"vec_id", $"embedding"),
      "embedding")
    // per-component reconstruction error <= scale/2 (the rounding bound)
    val viol = quant
      .select($"vec_id", $"scale",
        Similarity.dequantize($"qvec", $"scale").as("dq"),
        transform($"embedding", x => x.cast("double")).as("v"))
      .select($"vec_id", $"scale",
        aggregate(zip_with($"dq", $"v", (a, b) => abs(a - b)),
          lit(0.0), (acc, x) => greatest(acc, x)).as("maxerr"))
      .filter($"maxerr" > $"scale" / 2 + lit(1e-12))
      .count()
    assert(viol == 0, "dequantized error must stay within scale/2 per component")
    // recall@5 of brute-force ANN over DEQUANTIZED vectors vs originals:
    // int8 keeps neighborhoods (the point of shipping 4x fewer bytes)
    val q = e.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dq = quant.select($"vec_id",
      Similarity.dequantize($"qvec", $"scale").as("embedding"))
    val approx = Similarity.bruteForceTopK(
      dq.filter($"vec_id" < 5), dq, "vec_id", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall=$recall")
  }

  test("LSH ANN recall@10 clears the floor and is driver-visible") {
    val rec = graft.SparkEntry.queries("q_ann_lsh_recall")(spark, sfDir)
      .collect().map(_.getDouble(1))
    assert(rec.length == 10)
    assert(rec.forall(r => r >= 0.0 && r <= 1.0))
    // 2 bands x 3 planes is deliberately coarse; mean recall still must
    // clear a floor or the banding/bucketing broke
    assert(rec.sum / rec.length >= 0.1, rec.toSeq)
  }

  test("native vec_dot/vec_norm/vec_cosine match the HOF formulations bit-for-bit") {
    val e = Tables.load(spark, sfDir, "embeddings").limit(50)
    // float arrays straight from parquet on one side, double-cast on the
    // other — the expressions accept both and must cast per element
    // exactly like transform(x -> CAST(x AS DOUBLE))
    val asD = transform($"embedding", x => x.cast("double"))
    val pairs = e.select($"vec_id".as("a_id"), $"embedding".as("va"))
      .crossJoin(e.select($"vec_id".as("b_id"), asD.as("vb")))
      .filter($"a_id" < $"b_id").limit(500)
    val diffs = pairs.select(
      (Similarity.dot($"va", $"vb") -
        Similarity.dotHof(transform($"va", x => x.cast("double")), $"vb")).as("d1"),
      (Similarity.norm($"va") -
        Similarity.normHof(transform($"va", x => x.cast("double")))).as("d2"),
      (Similarity.cosine($"va", $"vb") -
        Similarity.cosineHof(transform($"va", x => x.cast("double")), $"vb")).as("d3"))
      .agg(sum(abs($"d1")), sum(abs($"d2")), sum(abs($"d3"))).head()
    assert(diffs.getDouble(0) == 0.0)
    assert(diffs.getDouble(1) == 0.0)
    assert(diffs.getDouble(2) == 0.0)
    // null / length-mismatch semantics mirror zip_with padding
    val edge = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d)) AS short,
        |  vec_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)) AS nul,
        |  vec_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS self""".stripMargin).head()
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.getDouble(2) == 1.0)
    // zero-norm / empty vectors → NULL (Spark Divide null-on-zero), never
    // NaN: NaN sorts above every double and would pass `> threshold`
    val zero = spark.sql(
      """SELECT vec_cosine(array(0.0f, 0.0f), array(1.0f, 2.0f)) AS za,
        |  vec_cosine(array(1.0d, 2.0d), array(0.0d, 0.0d)) AS zb,
        |  vec_cosine(CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)) AS empty""".stripMargin).head()
    assert(zero.isNullAt(0) && zero.isNullAt(1) && zero.isNullAt(2))
  }

  test("csv/json round-trip preserves values; text formats demand schema") {
    val ev = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"event_type", $"value").limit(100)
    for (fmt <- Seq("csv", "json")) {
      val dir = Files.createTempDirectory(s"graft_src_$fmt").toString + "/data"
      Sources.write(ev, dir, fmt)
      val back = Sources.read(spark, dir, fmt, Some(ev.schema))
      assert(back.collect().map(_.toSeq).toSet == ev.collect().map(_.toSeq).toSet)
    }
    assertThrows[IllegalArgumentException](
      Sources.read(spark, "/tmp/x", "csv", None))
    assertThrows[IllegalArgumentException](
      Sources.read(spark, "/tmp/x", "avro", Some(ev.schema)))
  }

  test("deterministic sampling is reproducible, nested, and roughly sized") {
    val docs = Tables.load(spark, sfDir, "documents")
    val s10 = Sampling.deterministicSample(docs, "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s10again = Sampling.deterministicSample(docs, "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s30 = Sampling.deterministicSample(docs, "doc_id", 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10 == s10again)          // reproducible
    assert(s10.subsetOf(s30))        // nested
    val n = docs.count().toDouble
    assert(math.abs(s10.size / n - 0.10) < 0.05)
    assert(math.abs(s30.size / n - 0.30) < 0.07)

    val strat = Sampling.deterministicStratified(docs, "doc_id", "lang",
      Map("en" -> 50, "de" -> 10))
    val langs = strat.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de"))) // unlisted strata dropped
  }

  test("partition_by config produces directory-partitioned model tables") {
    import graft.model._
    val whDir = Files.createTempDirectory("graft_wh_").toString
    val wh = new Warehouse(spark, whDir, StateStore(whDir + "/state"))
    val mat = new Materializer(wh)
    val df = Tables.load(spark, sfDir, "events")
      .withColumn("event_date", to_date($"ts"))
    val cfg = ModelConfig("ev_part", materialized = "table",
      meta = Map("partition_by" -> "event_date"))
    mat.materialize(cfg, df)
    val dirs = new java.io.File(s"$whDir/ev_part/v1").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_date=")))
    // partition pruning visible in the plan
    val plan = wh.read("ev_part").filter($"event_date" === "2024-01-05")
      .queryExecution.executedPlan.toString
    assert(wh.read("ev_part").count() == df.count())
  }
}
