package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connected components via large-star/small-star contraction (C88):
  * correctness on known topologies, the logarithmic round bound that
  * justifies its existence next to min-label propagation, and label
  * agreement with [[Dedup.duplicateClusters]] on a shared graph. */
class GraphComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxRounds: Int = 25) =
    Graph.connectedComponents(
      edges.toDF("src", "dst"), "src", "dst", maxRounds)
      .as[(Long, Long)].collect().toMap

  test("path graph collapses to its min in logarithmic rounds") {
    // a 64-node chain: min-label propagation needs 63 rounds to carry
    // label 0 to node 63; star contraction must do it in far fewer.
    // maxRounds=10 FAILS LOUDLY if the round bound is not logarithmic.
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = cc(chain, maxRounds = 10)
    assert(got.size == 64)
    assert(got.values.forall(_ == 0L))
  }

  test("multiple components, isolated self-loop, and null edges") {
    val edges = Seq[(java.lang.Long, java.lang.Long)](
      (10L, 11L), (11L, 12L), // component 10
      (20L, 21L),             // component 20
      (30L, 30L),             // self-loop only: its own component
      (null, 40L), (41L, null)) // null endpoints dropped entirely
      .toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("empty edge set returns empty result") {
    assert(cc(Seq.empty).isEmpty)
  }

  // ----------------- A39: hierarchy flattening (pointer doubling)

  test("flattenHierarchy: deep chain resolves in logarithmic rounds") {
    // parent(i) = i-1: a depth-40 chain. 2^6 = 64 > 40, so 7 rounds
    // must suffice — sequential self-joins would need 40.
    val h = (0L to 40L).map(i =>
      (i, if (i == 0L) null else java.lang.Long.valueOf(i - 1)))
      .toDF("id", "parent")
    val got = Graph.flattenHierarchy(h, "id", "parent", maxRounds = 7)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 41)
    assert((0L to 40L).forall(i => got(i) == ((0L, i))))
  }

  test("flattenHierarchy: forest, dangling parent reported as root") {
    val h = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, 1L), (4L, 2L),  // tree at 1
      (10L, null),                     // lone root
      (3L, 99L))                       // dangling parent 99
      .toDF("id", "parent")
    val got = Graph.flattenHierarchy(h, "id", "parent")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(1L -> ((1L, 0L)), 2L -> ((1L, 1L)),
      4L -> ((1L, 2L)), 10L -> ((10L, 0L)), 3L -> ((99L, 1L))))
  }

  test("flattenHierarchy: cycles and duplicate ids fail loudly") {
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("id", "parent")
    val e1 = intercept[IllegalArgumentException] {
      Graph.flattenHierarchy(cyc, "id", "parent", maxRounds = 5).collect()
    }
    assert(e1.getMessage.contains("CYCLE"))
    val dup = Seq((1L, 2L), (1L, 3L)).toDF("id", "parent")
    val e2 = intercept[IllegalArgumentException] {
      Graph.flattenHierarchy(dup, "id", "parent").collect()
    }
    assert(e2.getMessage.contains("duplicate id"))
  }

  test("loop right-sizing never touches the caller session's conf") {
    // connectedComponents lowers spark.sql.shuffle.partitions for its
    // overhead-bound contraction loop on a CLONED session
    // (Checkpoints.loopSession) — the caller's session conf must stay
    // untouched on every path, including the failure path, so queries
    // running concurrently on the same session can never observe the
    // lowered count.
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val out = Graph.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), "src", "dst")
    assert(spark.conf.get(key) == before)
    // the returned frame is re-homed onto the CALLER's session, so
    // downstream operators plan under the caller's conf, not the
    // loop clone's shrunken one
    assert(out.sparkSession eq spark)
    assert(out.collect().length == 3)
    // the failure path (no fixpoint within maxRounds, thrown INSIDE
    // the right-sized region) leaves the conf alone too
    val chain = (1L until 40L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      Graph.connectedComponents(
        chain.toDF("src", "dst"), "src", "dst", maxRounds = 1)
    }
    assert(spark.conf.get(key) == before)
    // loopSession itself: a lowered clone with an isolated conf
    val clone = graft.Checkpoints.loopSession(spark, rows = 10L)
    assert(clone ne spark)
    assert(clone.conf.get(key) == "1" && spark.conf.get(key) == before)
    // no lowering → the parent comes back, allocation-free
    assert(graft.Checkpoints.loopSession(
      spark, rows = 1000L * 1000 * 1000) eq spark)
  }

  test("labels agree with duplicateClusters on a shared random graph") {
    // deterministic pseudo-random sparse graph over 60 nodes
    def h(tag: String): Long = java.lang.Long.parseLong(
      graft.functions.HashImpl.md5Hex(tag.getBytes("UTF-8"))
        .substring(0, 8), 16) % 60L
    val edges = (0 until 90).map(i => (h(s"cca:$i"), h(s"ccb:$i")))
      .filter { case (a, b) => a != b }
    val star = cc(edges)
    val pairs = edges.toDF("a", "b")
    val prop = Dedup.duplicateClusters(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    // duplicateClusters covers only paired nodes; star covers the same
    // (every edge endpoint). Both label with the component min.
    assert(star == prop)
  }
}
