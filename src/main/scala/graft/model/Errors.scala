package graft.model

/** Typed error taxonomy — the Spark re-expression of the reference's
  * FrameworkError hierarchy (src/utils/errors.py:1-158). Callers (the
  * CLI above all) can discriminate configuration vs dependency vs
  * execution vs data-quality failures programmatically — each class
  * carries a stable `errorClass` token (surfaced in run statuses and
  * structured logs) and a distinct process exit code — instead of
  * string-matching bare IllegalArgument/IllegalState messages.
  *
  * Context renders like the reference's `message [Context: k=v, ...]`.
  */
abstract class GraftError(
    val baseMessage: String,
    val context: Map[String, String] = Map.empty,
    cause: Throwable = null)
  extends RuntimeException(GraftError.format(baseMessage, context), cause) {
  /** Stable machine-readable class token. */
  def errorClass: String
  /** CLI process exit code — distinct per failure class. */
  def exitCode: Int
}

object GraftError {
  private[model] def format(msg: String, ctx: Map[String, String]): String =
    if (ctx.isEmpty) msg
    else msg + ctx.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString(" [Context: ", ", ", "]")

  /** Fold an arbitrary failure into the taxonomy: typed errors pass
    * through, Spark analysis failures become SqlError, anything else an
    * ExecutionError — so every failure path yields one `errorClass` and
    * one exit code. */
  def classify(e: Throwable, model: String = ""): GraftError = e match {
    case g: GraftError => g
    case a: org.apache.spark.sql.AnalysisException =>
      new SqlError(Option(a.getSimpleMessage).getOrElse(a.getMessage),
        if (model.isEmpty) Map.empty else Map("model" -> model), a)
    case other =>
      new ExecutionError(Option(other.getMessage).getOrElse(other.toString),
        if (model.isEmpty) Map.empty else Map("model" -> model), other)
  }
}

/** Invalid model/project configuration (errors.py ConfigurationError). */
final class ConfigError(
    msg: String, ctx: Map[String, String] = Map.empty, cause: Throwable = null)
  extends GraftError(msg, ctx, cause) {
  val errorClass = "config_error"; val exitCode = 3
}

/** SQL that fails to parse or analyze (errors.py SQLParseError). */
final class SqlError(
    msg: String, ctx: Map[String, String] = Map.empty, cause: Throwable = null)
  extends GraftError(msg, ctx, cause) {
  val errorClass = "sql_error"; val exitCode = 4
}

/** Model execution / materialization failure (errors.py ExecutionError +
  * MaterializationError). */
final class ExecutionError(
    msg: String, ctx: Map[String, String] = Map.empty, cause: Throwable = null)
  extends GraftError(msg, ctx, cause) {
  val errorClass = "execution_error"; val exitCode = 5
}

/** Declarative data-quality test failure (errors.py TestError).
  * [[ModelRunner.ModelTestFailure]] extends this with the outcomes. */
class TestFailureError(
    msg: String, ctx: Map[String, String] = Map.empty, cause: Throwable = null)
  extends GraftError(msg, ctx, cause) {
  val errorClass = "test_failure"; val exitCode = 6
}

/** Dependency-graph problems, circular dependencies above all
  * (errors.py DependencyError / CircularDependencyError). */
final class DependencyError(
    msg: String, ctx: Map[String, String] = Map.empty, cause: Throwable = null)
  extends GraftError(msg, ctx, cause) {
  val errorClass = "dependency_error"; val exitCode = 7
}

/** State/warehouse bookkeeping problems: missing versions, reads of
  * never-materialized models (errors.py StateError). */
final class StateError(
    msg: String, ctx: Map[String, String] = Map.empty, cause: Throwable = null)
  extends GraftError(msg, ctx, cause) {
  val errorClass = "state_error"; val exitCode = 8
}
