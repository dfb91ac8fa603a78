package graft

import java.nio.file.{Files, Paths}
import graft.model._

/** Hot-reload (watch) loop: change a model file → only it and its
  * downstream impact re-run on the next poll. */
class CliSpec extends SparkSpec {

  test("watch re-runs changed models and their impact, then settles") {
    Tables.registerAll(spark, sfDir)
    val proj = Files.createTempDirectory("graft_proj_")
    val models = proj.resolve("models")
    Files.createDirectories(models)
    Files.writeString(models.resolve("base.sql"),
      """-- config: materialized=table
        |SELECT o_orderkey, o_totalprice FROM {{ source('raw', 'orders') }}
        |WHERE o_totalprice > 100""".stripMargin)
    Files.writeString(models.resolve("agg.sql"),
      """-- config: materialized=table
        |SELECT COUNT(*) AS n FROM {{ ref('base') }}""".stripMargin)

    // first pass materializes both; second pass must be a no-op
    Cli.watch(spark, proj, intervalMs = 1, maxIterations = 2)
    val whDir = proj.resolve("warehouse").toString
    val state = StateStore(whDir + "/state")
    val wh = new Warehouse(spark, whDir, state)
    assert(wh.currentVersion("base").contains(1L))
    assert(wh.currentVersion("agg").contains(1L))
    val n1 = wh.read("agg").head().getLong(0)

    // edit base -> next poll re-runs base AND agg (impact), versions bump
    Files.writeString(models.resolve("base.sql"),
      """-- config: materialized=table
        |SELECT o_orderkey, o_totalprice FROM {{ source('raw', 'orders') }}
        |WHERE o_totalprice > 200000""".stripMargin)
    Cli.watch(spark, proj, intervalMs = 1, maxIterations = 1)
    val state2 = StateStore(whDir + "/state")
    val wh2 = new Warehouse(spark, whDir, state2)
    assert(wh2.currentVersion("base").contains(2L))
    assert(wh2.currentVersion("agg").contains(2L))
    val n2 = wh2.read("agg").head().getLong(0)
    assert(n2 < n1) // tighter filter -> fewer rows counted
  }
}
