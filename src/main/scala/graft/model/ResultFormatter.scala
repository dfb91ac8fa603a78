package graft.model

import org.apache.spark.sql.DataFrame

/** Result formatting for CLI/driver output — the Spark re-expression of
  * the reference's ResultFormatter (src/framework/executor.py:456-516:
  * to_json / to_csv / to_table). Limits are applied in the plan (limit
  * pushdown) before anything reaches the driver.
  */
object ResultFormatter {

  def format(df: DataFrame, formatType: String, limit: Int = 100): String = {
    val limited = df.limit(limit)
    formatType match {
      case "json" => limited.toJSON.collect().mkString("[", ",", "]")
      case "csv" => toCsv(limited)
      case "table" => limited.showString(limit, truncate = 0)
      case other => throw new IllegalArgumentException(s"Unsupported format: $other")
    }
  }

  private def toCsv(df: DataFrame): String = {
    val header = df.columns.mkString(",")
    val rows = df.collect().map(_.toSeq.map {
      case null => ""
      case s: String if s.contains(",") || s.contains("\"") =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case v => v.toString
    }.mkString(","))
    (header +: rows).mkString("\n")
  }

  // Dataset.showString is private[sql]; rebuild the table rendering.
  implicit private class ShowString(df: DataFrame) {
    def showString(numRows: Int, truncate: Int): String = {
      val rows = df.take(numRows)
      val headers = df.columns
      val cells = rows.map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("null")))
      val widths = headers.indices.map { i =>
        (headers(i).length +: cells.map(_(i).length)).max
      }
      def line(parts: Seq[String]): String =
        parts.zip(widths).map { case (s, w) => s.padTo(w, ' ') }
          .mkString("| ", " | ", " |")
      val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
      (Seq(sep, line(headers.toSeq), sep) ++ cells.map(line) :+ sep).mkString("\n")
    }
  }
}
