package graft.model

/** Project documentation generation — dbt `docs generate` parity, as a
  * markdown catalog instead of a served site: one section per model
  * with its materialization, tags, meta (dbt `description` lives here),
  * dependencies both ways, declared tests, contract, and — when the
  * model is materialized — the ACTUAL warehouse schema, so the doc
  * states what is true, not what was intended.
  *
  * Ref behavior: the reference has no docs surface; dbt-parity
  * framework completion like seeds (B35) and hooks (B36). Pure
  * metadata walk — reads schemas, never data.
  */
object Docs {

  def markdown(wh: Warehouse, runner: ModelRunner): String = {
    val g = runner.graph
    val sb = new StringBuilder
    sb ++= "# Project catalog\n\n"
    sb ++= s"${g.models.size} models\n"
    val byName = runner.configMap
    g.models.sorted.foreach { name =>
      sb ++= s"\n## $name\n\n"
      byName.get(name) match {
        case None =>
          sb ++= "_referenced but not defined in this project_\n"
        case Some(cfg) =>
          // schema.yml model description leads the section (dbt docs
          // ordering); a `-- meta: description=` header still renders
          // via the meta fallback below when no sidecar declares one.
          cfg.description.foreach(d => sb ++= s"$d\n\n")
          sb ++= s"- materialized: `${cfg.materialized}`"
          cfg.incrementalStrategy.foreach(s => sb ++= s" (strategy `$s`)")
          sb ++= "\n"
          if (cfg.tags.nonEmpty)
            sb ++= s"- tags: ${cfg.tags.toSeq.sorted.mkString(", ")}\n"
          if (cfg.description.isEmpty)
            cfg.meta.get("description").foreach(d => sb ++= s"- description: $d\n")
          val deps = g.dependencies(name)
          if (deps.nonEmpty)
            sb ++= s"- depends on: ${deps.toSeq.sorted.mkString(", ")}\n"
          val dependents = g.dependents(name)
          if (dependents.nonEmpty)
            sb ++= s"- used by: ${dependents.toSeq.sorted.mkString(", ")}\n"
          if (cfg.tests.nonEmpty)
            sb ++= s"- tests: ${cfg.tests.map(t =>
              s"${t.testType}(${(t.column +: t.params).mkString(", ")})")
              .mkString("; ")}\n"
          if (cfg.contract.nonEmpty)
            sb ++= s"- contract: ${cfg.contract.map { case (c, t) => s"$c:$t" }
              .mkString(", ")}\n"
          val colDocs = cfg.columns.map(c => c.name -> c).toMap
          if (wh.exists(name)) {
            sb ++= s"- columns (materialized v${wh.currentVersion(name).getOrElse(0L)}):\n"
            wh.read(name).schema.fields.foreach { f =>
              val desc = colDocs.get(f.name).flatMap(_.description)
                .map(d => s" — $d").getOrElse("")
              sb ++= s"  - `${f.name}` ${f.dataType.simpleString}$desc\n"
            }
          } else if (cfg.columns.nonEmpty) {
            // not materialized yet, but the sidecar documents columns —
            // render the declared catalog so docs are useful pre-run
            sb ++= "- columns (declared, not materialized yet):\n"
            cfg.columns.foreach { c =>
              val desc = c.description.map(d => s" — $d").getOrElse("")
              sb ++= s"  - `${c.name}`$desc\n"
            }
          } else sb ++= "- columns: _not materialized yet_\n"
      }
    }
    sb.result()
  }
}
