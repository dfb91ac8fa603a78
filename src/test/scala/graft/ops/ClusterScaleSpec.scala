package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.Tag
import graft.{SparkSpec, Tables}

/** Slow-tagged scale guard for the iterative label-propagation loop. */
object SlowTest extends Tag("graft.SlowTest")

class ClusterScaleSpec extends SparkSpec {

  test("duplicateClusters handles a 10^6-edge graph in bounded rounds/time",
      SlowTest) {
    import spark.implicits._
    // ~889k undirected edges: 111,112 disjoint chains of 9 nodes each
    // (diameter 8 → needs 8 propagation rounds + 1 confirming round,
    // well under the default maxIter of 20). Chains are the WORST case
    // per edge for min-label propagation — real dedup graphs are
    // near-cliques that converge in 2-3 rounds.
    val n = 1000000L
    val edges = spark.range(n)
      .filter($"id" % 9 =!= 8)
      .select($"id".as("a"), ($"id" + 1).as("b"))
    val load0 = sampleLoad()
    val t0 = System.nanoTime()
    val clusters = Dedup.duplicateClusters(edges.toDF(), "a", "b")
    // every node's cluster must be its chain head (id - id % 9);
    // verified distributively — no 10^6-row driver collect
    val bad = clusters
      .filter(col("cluster") =!= (col("a") - (col("a") % 9)))
      .limit(1).count()
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(bad == 0)
    assert(clusters.select(countDistinct(col("cluster"))).head().getLong(0)
      == (n + 8) / 9)
    // The checkpoint-per-round loop keeps lineage one round deep; the
    // round-1 regression (cache-chained lineage) was 6-16x slower and
    // would blow far past this generous wall-clock guard.
    val bound = loadScaledBound(300.0, load0)
    assert(elapsedSec < bound,
      s"label propagation took $elapsedSec s (bound $bound s)")
  }
}
