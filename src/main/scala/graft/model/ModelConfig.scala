package graft.model

/** Model configuration, the Spark re-expression of the reference's
  * ModelConfig (reference: src/framework/model.py:66-140) and its inline
  * `-- config:` comment convention (src/framework/parser.py:240-257).
  */
final case class ModelConfig(
    name: String,
    materialized: String = "view", // view|table|temp_table|incremental|cdc|cdc_scd2
    incrementalStrategy: Option[String] = None, // time|unique_key|append
    timeColumn: Option[String] = None,
    uniqueKey: Option[String] = None,
    changeTypeColumn: String = "__cdc_operation",
    enabled: Boolean = true,
    dependsOn: Set[String] = Set.empty,
    tags: Set[String] = Set.empty,
    meta: Map[String, String] = Map.empty) {

  def isIncremental: Boolean = materialized == "incremental"

  /** Mirrors model.py:validate_model_config (model.py:300-331). */
  def validate(): Unit = {
    if (isIncremental) {
      require(incrementalStrategy.isDefined,
        s"Incremental model '$name' must specify incremental_strategy")
      if (incrementalStrategy.contains("time"))
        require(timeColumn.isDefined,
          s"Incremental model '$name' with time strategy must specify time_column")
      if (incrementalStrategy.contains("unique_key"))
        require(uniqueKey.isDefined,
          s"Incremental model '$name' with unique_key strategy must specify unique_key")
    }
    if (materialized == "cdc" || materialized == "cdc_scd2")
      require(uniqueKey.isDefined, s"unique_key required for CDC model '$name'")
  }
}

object ModelConfig {

  private val ConfigLine = """(?m)^\s*--\s*config:\s*(.+?)\s*$""".r
  private val DependsLine = """(?m)^\s*--\s*depends_on:\s*(.+?)\s*$""".r
  private val TagsLine = """(?m)^\s*--\s*tags:\s*(.+?)\s*$""".r

  /** Parse `-- config: key=value, key2=value2` and `-- depends_on: a, b`
    * comment headers out of a model's SQL text.
    */
  def fromSql(name: String, sql: String): ModelConfig = {
    val kvs: Map[String, String] = ConfigLine.findAllMatchIn(sql).flatMap { m =>
      m.group(1).split(",").toSeq.flatMap { pair =>
        pair.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }
    }.toMap
    val deps: Set[String] = DependsLine.findAllMatchIn(sql)
      .flatMap(_.group(1).split(",").map(_.trim).filter(_.nonEmpty)).toSet
    val tags: Set[String] = TagsLine.findAllMatchIn(sql)
      .flatMap(_.group(1).split(",").map(_.trim).filter(_.nonEmpty)).toSet

    val known = Set("materialized", "incremental_strategy", "time_column",
      "unique_key", "change_type_column", "enabled")
    ModelConfig(
      name = name,
      materialized = kvs.getOrElse("materialized", "view") match {
        case "incremental_table" => "incremental" // alias, materialization.py:606
        case other => other
      },
      incrementalStrategy = kvs.get("incremental_strategy"),
      timeColumn = kvs.get("time_column"),
      uniqueKey = kvs.get("unique_key"),
      changeTypeColumn = kvs.getOrElse("change_type_column", "__cdc_operation"),
      enabled = kvs.get("enabled").forall(_.toBoolean),
      dependsOn = deps,
      tags = tags,
      meta = kvs.filterNot { case (k, _) => known.contains(k) })
  }
}
