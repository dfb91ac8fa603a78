package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.{Materializer, ModelConfig, StateStore, Warehouse}

/** Asymmetric-partitioning as-of join: one side a 4-bucket table, the
  * other an unbucketed DataFrame. EnsureRequirements must co-partition
  * the children (zipPartitions demands equal partition counts), whatever
  * partitionings the inputs arrive with. */
class AsofMixedSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join aligns a bucketed side with an unbucketed side") {
    val dir = Files.createTempDirectory("graft_wh_").toString
    val wh = new Warehouse(spark, dir, StateStore(dir + "/state"))
    val mat = new Materializer(wh)
    val quotes = (1 to 300).map(i =>
      (i.toLong % 20, i.toLong - 1, i.toLong * 10 + 1)).toDF("k", "ts", "id")
    mat.materialize(ModelConfig("quotes_b", materialized = "table",
      meta = Map("bucket_by" -> "k", "buckets" -> "4", "sort_by" -> "k;ts")),
      quotes)

    val trades = (1 to 300).map(i =>
      (i.toLong % 20, i.toLong, i.toLong * 10)).toDF("k", "ts", "id")

    val out = TemporalJoins.asOfJoinNative(
      trades, wh.read("quotes_b"), "k", "ts", "id")
    // matches the composed formulation on the same inputs
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"matched_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(key(out) == key(TemporalJoins.asOfJoin(
      trades, wh.read("quotes_b"), "k", "ts", "id")))
    // and the reverse orientation (bucketed left, plain right)
    val out2 = TemporalJoins.asOfJoinNative(
      wh.read("quotes_b"), trades, "k", "ts", "id")
    assert(key(out2) == key(TemporalJoins.asOfJoin(
      wh.read("quotes_b"), trades, "k", "ts", "id")))
  }
}
