package graft

import org.apache.spark.sql.functions._

/** Invariants of the scale-probe replication: the numbers ScaleBench
  * publishes are only meaningful if the replicated corpus is what the
  * doc says it is — distinct (not exact-duplicate) documents, FK-
  * consistent facts, and a scaled dir that can never silently serve a
  * different factor's data.
  */
class ScaleBenchSpec extends SparkSpec {
  import spark.implicits._

  test("scaled dir: factor change rebuilds; same factor reuses") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_").toString
    val base = spark.read.parquet(Tables.path(sfDir, "documents")).count()
    ScaleBench.buildScaled(spark, sfDir, dir, factor = 2)
    assert(spark.read.parquet(Tables.path(dir, "documents")).count() == 2 * base)
    // same stamp -> reuse (marker mtime unchanged means no rebuild ran)
    val marker = java.nio.file.Paths.get(dir, "_SCALED")
    val t1 = java.nio.file.Files.getLastModifiedTime(marker)
    ScaleBench.buildScaled(spark, sfDir, dir, factor = 2)
    assert(java.nio.file.Files.getLastModifiedTime(marker) == t1)
    // different factor -> rebuild, not stale reuse of the 2x data
    ScaleBench.buildScaled(spark, sfDir, dir, factor = 3)
    assert(spark.read.parquet(Tables.path(dir, "documents")).count() == 3 * base)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("replicated docs are pairwise distinct even when shorter than the factor") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_").toString
    val factor = 12 // > token count of short docs (few distinct shuffles)
    ScaleBench.buildScaled(spark, sfDir, dir, factor)
    val docs = spark.read.parquet(Tables.path(dir, "documents"))
    // no two replicas of any base doc share text: group by (base id,
    // text) must be singletons (base id = doc_id mod the 10^12 stride)
    val dupReplicas = docs
      .groupBy(pmod($"doc_id", lit(1000000000000L)), $"text")
      .count().filter($"count" > 1).count()
    assert(dupReplicas == 0,
      "replicas must be tagged/shuffled, never exact cross-replica duplicates")
    // facts stay FK-consistent: every replicated lineitem row still
    // joins an orders row (same stride on both sides)
    val li = spark.read.parquet(Tables.path(dir, "lineitem"))
    val o = spark.read.parquet(Tables.path(dir, "orders"))
    val orphans = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
    assert(orphans.isEmpty, "replicated lineitem must keep its orders FK")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
