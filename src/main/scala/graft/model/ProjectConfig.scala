package graft.model

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Project configuration: YAML profiles / environments / sources with
  * `${ENV_VAR}` substitution — the Spark re-expression of the reference's
  * Config (src/framework/config.py:18-443). Snowflake connection blocks
  * become Spark-relevant settings (warehouse root, source path mappings,
  * per-environment variable defaults).
  *
  * Layout under `<project>/config/`:
  *   profiles.yml      default: { target: dev, outputs: { dev: {...} } }
  *   environments.yml  dev: { vars: { k: v }, warehouse_dir: ... }
  *   sources.yml       sources: [ { name, path?, tables: [ { name,
  *                     identifier?, path? } ] } ]
  */
final class ProjectConfig(projectDir: Path, env: Map[String, String] = sys.env) {

  private val mapper = new ObjectMapper(new YAMLFactory())
  private val configDir = projectDir.resolve("config")

  val profiles: Map[String, Any] = loadYaml("profiles.yml")
  val environments: Map[String, Any] = loadYaml("environments.yml")
  val sources: Map[String, Any] = loadYaml("sources.yml")

  /** config.py:66-69 — target from profiles.default.target, else "dev". */
  val currentTarget: String =
    nested(profiles, "default", "target").map(_.toString).getOrElse("dev")

  /** ${VAR} / ${VAR:-default} substitution (config.py:178-203). */
  private[model] def substituteEnvVars(content: String): String = {
    val pat = raw"""\$$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}""".r
    pat.replaceAllIn(content, m => {
      val value = env.getOrElse(m.group(1), Option(m.group(2)).getOrElse {
        throw new IllegalArgumentException(
          s"Environment variable not set and no default: ${m.group(1)}")
      })
      scala.util.matching.Regex.quoteReplacement(value)
    })
  }

  private def loadYaml(name: String): Map[String, Any] = {
    val f = configDir.resolve(name)
    if (!Files.exists(f)) return Map.empty
    val content = substituteEnvVars(Files.readString(f))
    toScala(mapper.readValue(content, classOf[java.util.Map[String, Object]]))
      .asInstanceOf[Map[String, Any]]
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> toScala(vv) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toList
    case other => other
  }

  private def nested(m: Map[String, Any], path: String*): Option[Any] =
    path.foldLeft(Option(m: Any)) {
      case (Some(mm: Map[String, Any] @unchecked), key) => mm.get(key)
      case _ => None
    }

  /** Connection/output block for a target (config.py:205-310). */
  def connectionConfig(target: Option[String] = None): Map[String, Any] =
    nested(profiles, "default", "outputs", target.getOrElse(currentTarget))
      .collect { case m: Map[String, Any] @unchecked => m }
      .getOrElse(Map.empty)

  /** Per-environment block (config.py:312-330). */
  def environmentConfig(environment: String): Map[String, Any] =
    environments.get(environment)
      .collect { case m: Map[String, Any] @unchecked => m }
      .getOrElse(Map.empty)

  /** Per-environment variable defaults for model rendering. */
  def environmentVars(environment: String): Map[String, String] =
    environmentConfig(environment).get("vars")
      .collect { case m: Map[String, Any] @unchecked => m }
      .getOrElse(Map.empty)
      .map { case (k, v) => k -> v.toString }

  /** (source, table) → path/identifier mapping for ModelRunner
    * (config.py:121-176: source_name.table_name → physical identifier). */
  def sourceTableMap: Map[(String, String), String] = {
    val srcList = sources.get("sources").collect {
      case l: List[Any] @unchecked => l
    }.getOrElse(Nil)
    srcList.collect { case src: Map[String, Any] @unchecked =>
      val srcName = src("name").toString
      val basePath = src.get("path").map(_.toString)
      val tables = src.get("tables").collect {
        case l: List[Any] @unchecked => l
      }.getOrElse(Nil)
      tables.collect { case t: Map[String, Any] @unchecked =>
        val tName = t("name").toString
        val ident = t.get("identifier").orElse(t.get("path")).map(_.toString)
          .orElse(basePath.map(p => s"$p/$tName"))
          .getOrElse(tName)
        (srcName, tName) -> ident
      }
    }.flatten.toMap
  }
}
