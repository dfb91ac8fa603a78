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
