package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.Bridge

/** Pins the Bridge surfaces the loop-session machinery leans on:
  * rebind must re-home a truncated frame without losing its
  * materialized leaf (re-homing must never trigger a recompute), and
  * allLeavesMaterialized must separate truncated frames (cheap count)
  * from live plans (count = full re-execution) — the decision input
  * for Warehouse.withResolvedNumFiles. */
class BridgeSpec extends SparkSpec {
  import spark.implicits._

  test("rebind re-homes a truncated frame, keeps the materialized leaf") {
    val df = Checkpoints.truncate(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    assert(Bridge.allLeavesMaterialized(df))
    val clone = Bridge.cloneSession(spark)
    clone.conf.set("spark.sql.shuffle.partitions", "1")
    val hopped = Bridge.rebind(df, clone)
    assert(hopped.sparkSession eq clone)
    // the leaf survives the hop — downstream ops still see a
    // materialized RDD, not a plan to re-execute
    assert(Bridge.allLeavesMaterialized(hopped))
    assert(Bridge.allLeavesMaterialized(hopped.filter(col("id") > 1L)))
    // values identical both sides; caller's session untouched
    assert(hopped.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    assert(spark.sessionState.conf.numShufflePartitions ==
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // rebind to the frame's own session is the identity
    assert(Bridge.rebind(df, spark) eq df)
  }

  test("allLeavesMaterialized separates truncated frames from live plans") {
    val live = Tables.load(spark, sfDir, "orders")
    assert(!Bridge.allLeavesMaterialized(live))
    assert(!Bridge.allLeavesMaterialized(
      live.join(Checkpoints.truncate(live.select("o_orderkey")),
        Seq("o_orderkey")))) // one live leaf poisons the whole plan
    val t = Checkpoints.truncate(live.groupBy("o_orderstatus").count())
    assert(Bridge.allLeavesMaterialized(t))
  }

  test("cloneSession isolates conf but carries registered functions") {
    val clone = Bridge.cloneSession(spark)
    clone.conf.set("spark.sql.shuffle.partitions", "3")
    assert(spark.conf.get("spark.sql.shuffle.partitions") != "3")
    // graft extension functions (registered via GraftExtensions at
    // session build) survive the clone — loop bodies may call them
    val out = clone.sql(
      "SELECT simhash60(split('a b c a', ' ')) AS h").collect()
    assert(out.length == 1)
  }
}
