package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession
import graft.model._

/** Project CLI — the Spark re-expression of the reference's click CLI
  * (reference: src/framework/cli.py:34-344): run / run-all / plan / list /
  * deps / validate / serve(watch).
  *
  * A "project" is a directory of .sql model files (SqlTemplate surface +
  * `-- config:` headers). Sources resolve to the testdata tables; models
  * materialize into `<project>/warehouse`.
  *
  * Usage:
  *   graft.Cli <projectDir> run [model ...] [--var k=v ...]
  *   graft.Cli <projectDir> plan
  *   graft.Cli <projectDir> list | deps | validate
  *   graft.Cli <projectDir> watch [intervalMs]   # hot reload loop
  */
object Cli {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Cli <projectDir> <command> [args]")
    val projectDir = Paths.get(args(0))
    val command = args(1)
    val rest = args.drop(2).toSeq

    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Tables.registerAll(spark, sfDir)

    try {
      val (wh, runner) = openProject(spark, projectDir)
      command match {
        case "run" =>
          val (models, vars, tag) = parseRunArgs(rest)
          val targets = tag.map(runner.modelsByTag)
            .orElse(if (models.isEmpty) None else Some(models))
          val results = runner.run(targets, vars)
          results.foreach(r => println(s"${r.modelName}: ${r.materialization} ${r.status}"))
        case "plan" =>
          val p = Planner.plan(runner.modelSqlMap, runner.configMap, runner.graph, wh.state)
          println(s"summary: ${p.summary.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", ")}")
          p.changes.foreach(c => println(s"  ${c.changeType.value}: ${c.modelName} (${c.reason})"))
        case "list" =>
          runner.graph.models.sorted.foreach { m =>
            val cfg = runner.configMap.get(m)
            println(s"$m [${cfg.map(_.materialized).getOrElse("?")}]")
          }
        case "deps" =>
          println(runner.graph.toDot)
        case "lineage" =>
          val model = rest.headOption.getOrElse(
            sys.error("usage: lineage <model>"))
          // Hydrate upstream relations (materialized versions where they
          // exist, rendered views otherwise) so analysis can resolve refs.
          runner.graph.executionOrder(Some(Seq(model))).flatten
            .filter(m => m != model && runner.modelSqlMap.contains(m))
            .foreach { m =>
              if (wh.exists(m)) wh.refreshView(m)
              else wh.registerView(m,
                spark.sql(runner.render(m, dummyVars(runner, m))))
            }
          val df = spark.sql(runner.render(model, dummyVars(runner, model)))
          Lineage.of(df).foreach { l =>
            val fns = if (l.transformations.isEmpty) ""
              else l.transformations.toSeq.sorted.mkString(" [", ", ", "]")
            println(s"${l.column} <- ${l.sources.toSeq.sorted.mkString(", ")}$fns")
          }
        case "validate" =>
          var ok = true
          runner.configMap.foreach { case (name, cfg) =>
            try { cfg.validate(); runner.render(name, dummyVars(runner, name)) }
            catch { case e: Exception => ok = false; println(s"INVALID $name: ${e.getMessage}") }
          }
          runner.graph.findCycle().foreach { c =>
            ok = false; println(s"CYCLE: ${c.mkString(" -> ")}")
          }
          println(if (ok) "all models valid" else "validation failed")
          if (!ok) sys.exit(1)
        case "watch" =>
          val interval = rest.headOption.map(_.toLong).getOrElse(2000L)
          watch(spark, projectDir, interval)
        case other =>
          System.err.println(s"unknown command: $other"); sys.exit(2)
      }
    } finally spark.stop()
  }

  private def openProject(spark: SparkSession, dir: Path): (Warehouse, ModelRunner) = {
    val cfg = new ProjectConfig(dir)
    // config/ may override the warehouse location and add source mappings;
    // the testdata tables stay available under source('raw', ...).
    val whDir = cfg.connectionConfig().get("warehouse_dir").map(_.toString)
      .getOrElse(dir.resolve("warehouse").toString)
    val state = StateStore(whDir + "/state", cfg.currentTarget)
    val wh = new Warehouse(spark, whDir, state)
    val sources = Tables.names.map(t => ("raw", t) -> t).toMap ++ cfg.sourceTableMap
    val runner = new ModelRunner(wh, sources)
    val modelsDir = dir.resolve("models")
    if (Files.isDirectory(modelsDir)) runner.addModelsFromDir(modelsDir)
    (wh, runner)
  }

  private def parseRunArgs(
      rest: Seq[String]): (Seq[String], Map[String, String], Option[String]) = {
    val vars = rest.sliding(2).collect {
      case Seq("--var", kv) if kv.contains("=") =>
        val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap
    val tag = rest.sliding(2).collectFirst { case Seq("--tag", t) => t }
    val models = rest.zipWithIndex.filter { case (a, i) =>
      !a.startsWith("--") && a.nonEmpty && !a.contains("=") &&
        (i == 0 || !rest(i - 1).startsWith("--"))
    }.map(_._1)
    (models, vars, tag)
  }

  private def dummyVars(runner: ModelRunner, name: String): Map[String, String] =
    SqlTemplate.extractVariables(runner.modelSqlMap(name))
      .map(_ -> "0").toMap

  /** Hot-reload loop — the reference's watcher (src/framework/
    * watcher.py:24-148): poll model files, diff hashes via the Planner,
    * re-run only changed models + their downstream impact. */
  def watch(spark: SparkSession, projectDir: Path, intervalMs: Long,
      maxIterations: Long = Long.MaxValue): Unit = {
    var iter = 0L
    while (iter < maxIterations) {
      val (wh, runner) = openProject(spark, projectDir)
      val plan = Planner.plan(runner.modelSqlMap, runner.configMap, runner.graph, wh.state)
      val toRun = plan.toRun
      if (toRun.nonEmpty) {
        println(s"[watch] change detected: ${toRun.toSeq.sorted.mkString(", ")}")
        runner.run(Some(toRun.toSeq))
      }
      iter += 1
      if (iter < maxIterations) Thread.sleep(intervalMs)
    }
  }
}
