package graft.model

/** Plan-based execution: diff current model definitions against stored
  * state before running — the Spark re-expression of the reference's
  * SQLMesh-style planner (src/framework/plan.py:18-244).
  */
object Planner {

  sealed trait ChangeType { def value: String }
  case object Create extends ChangeType { val value = "create" }
  case object Update extends ChangeType { val value = "update" }
  case object NoChange extends ChangeType { val value = "no_change" }

  final case class ModelChange(
      modelName: String,
      changeType: ChangeType,
      reason: String,
      dependentsAffected: Set[String])

  final case class ExecutionPlan(
      changes: Seq[ModelChange],
      executionOrder: Seq[Seq[String]]) {
    def byType(t: ChangeType): Seq[ModelChange] = changes.filter(_.changeType == t)
    def summary: Map[String, Int] = Map(
      "total_models" -> changes.size,
      "creates" -> byType(Create).size,
      "updates" -> byType(Update).size,
      "no_changes" -> byType(NoChange).size,
      "execution_levels" -> executionOrder.size)
    /** Models that actually need execution (changed + impacted). */
    def toRun: Set[String] = {
      val changed = changes.collect {
        case c if c.changeType != NoChange => c.modelName
      }.toSet
      changed ++ changes.filter(c => changed.contains(c.modelName))
        .flatMap(_.dependentsAffected)
    }
  }

  /** plan.py:114-230 — classify each model by hash diff vs state.
    * `fullRefresh` (plan.py:118-154) bypasses the hash diff entirely:
    * every model is forced to execute ("full refresh requested"), the
    * recovery path when the state file is stale or a table is corrupt —
    * no hand-deleting state. */
  def plan(
      modelSql: Map[String, String],
      configs: Map[String, ModelConfig],
      graph: DependencyGraph,
      state: StateStore,
      fullRefresh: Boolean = false): ExecutionPlan = {
    val changes = modelSql.keys.toSeq.sorted.map { name =>
      val fileHash = StateStore.sha256(modelSql(name))
      val configHash = StateStore.sha256(configs(name).toString)
      val change =
        if (fullRefresh)
          // forced before the state lookup, exactly like plan.py:154 —
          // a never-run model still plans Create, the rest Update
          state.get(name) match {
            case None => ModelChange(name, Create, "full refresh requested",
              graph.allDependents(name))
            case Some(_) => ModelChange(name, Update, "full refresh requested",
              graph.allDependents(name))
          }
        else state.get(name) match {
          case None =>
            ModelChange(name, Create, "new model", graph.allDependents(name))
          case Some(s) if s.fileHash != fileHash =>
            ModelChange(name, Update, "SQL changed", graph.allDependents(name))
          case Some(s) if s.configHash != configHash =>
            ModelChange(name, Update, "config changed", graph.allDependents(name))
          case Some(_) =>
            ModelChange(name, NoChange, "unchanged", Set.empty)
        }
      change
    }
    ExecutionPlan(changes, graph.topoLevels())
  }
}
