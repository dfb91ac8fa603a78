package graft.model

/** Model SQL templating: the Spark re-expression of the reference's Jinja
  * surface (reference: src/framework/parser.py:92-360, executor.py:341-445).
  *
  * Supported constructs:
  *   - `{{ ref('model') }}`      → resolved relation name (another model)
  *   - `{{ source('s', 't') }}`  → resolved source relation name
  *   - `{{ this }}`              → the current model's relation name
  *   - `{% if is_incremental() %} ... {% endif %}` conditional blocks
  *     (with optional `{% else %}`)
  *   - `$variable` substitution (Snowflake-style, executor.py:341-398)
  *
  * Rendering is pure string → string; the result runs through
  * `spark.sql(...)`, so Catalyst sees a fully declarative plan.
  */
object SqlTemplate {

  private val RefPat = raw"""\{\{\s*ref\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val SourcePat = raw"""\{\{\s*source\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val ThisPat = raw"""\{\{\s*this\s*\}\}""".r
  private val IfIncrPat =
    raw"""(?s)\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)(?:\{%\s*else\s*%\}(.*?))?\{%\s*endif\s*%\}""".r
  private val VarPat = raw"""\$$([a-zA-Z_][a-zA-Z0-9_]*)""".r
  private val CommentLine = raw"""(?m)^\s*--.*$$""".r

  /** Model dependencies referenced via ref(). */
  def extractRefs(sql: String): Set[String] =
    RefPat.findAllMatchIn(sql).map(_.group(1)).toSet

  /** Source tables referenced via source(), as "source.table". */
  def extractSources(sql: String): Set[(String, String)] =
    SourcePat.findAllMatchIn(sql).map(m => (m.group(1), m.group(2))).toSet

  /** `$variables` required by the SQL (after comment stripping). */
  def extractVariables(sql: String): Set[String] =
    VarPat.findAllMatchIn(CommentLine.replaceAllIn(sql, "")).map(_.group(1)).toSet

  /** Render a model's SQL to executable Spark SQL.
    *
    * @param resolveRef     model name → relation name visible to spark.sql
    * @param resolveSource  (source, table) → relation name
    * @param isIncremental  value of is_incremental() for this run
    * @param variables      $var substitutions (missing vars throw)
    */
  def render(
      sql: String,
      modelName: String,
      resolveRef: String => String,
      resolveSource: (String, String) => String,
      isIncremental: Boolean = false,
      variables: Map[String, String] = Map.empty): String = {

    var out = sql
    // Strip `-- config:` style header comments so $vars inside them don't
    // trip validation; keep other comments (harmless to Spark SQL).
    out = CommentLine.replaceAllIn(out, "")
    out = IfIncrPat.replaceAllIn(out, m => {
      val branch = if (isIncremental) m.group(1) else Option(m.group(2)).getOrElse("")
      scala.util.matching.Regex.quoteReplacement(branch)
    })
    out = RefPat.replaceAllIn(out, m =>
      scala.util.matching.Regex.quoteReplacement(resolveRef(m.group(1))))
    out = SourcePat.replaceAllIn(out, m =>
      scala.util.matching.Regex.quoteReplacement(resolveSource(m.group(1), m.group(2))))
    out = ThisPat.replaceAllIn(out,
      scala.util.matching.Regex.quoteReplacement(resolveRef(modelName)))

    val needed = extractVariables(out)
    val missing = needed -- variables.keySet
    require(missing.isEmpty,
      s"Model '$modelName' is missing variables: ${missing.mkString(", ")}")
    out = VarPat.replaceAllIn(out, m =>
      scala.util.matching.Regex.quoteReplacement(variables(m.group(1))))
    out.trim
  }
}
