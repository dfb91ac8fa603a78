package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source readers / sink writers. The reference reads from
  * one warehouse; a lake engine needs parquet/csv/json/orc symmetric IO.
  * These are thin, but they centralize the options that matter at scale
  * (schema always supplied for text formats — runtime inference is a
  * full extra pass over 100 TB).
  */
object Sources {

  val supported: Set[String] = Set("parquet", "csv", "json", "orc")

  def read(
      spark: SparkSession,
      path: String,
      format: String = "parquet",
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(supported.contains(format), s"unsupported format: $format")
    val r = spark.read.format(format).options(defaults(format) ++ options)
    schema match {
      case Some(s) => r.schema(s).load(path)
      case None =>
        require(format == "parquet" || format == "orc",
          s"$format requires an explicit schema (inference scans the data twice)")
        r.load(path)
    }
  }

  def write(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil,
      options: Map[String, String] = Map.empty): Unit = {
    require(supported.contains(format), s"unsupported format: $format")
    val w = df.write.format(format).mode(mode)
      .options(defaults(format) ++ options)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  private def defaults(format: String): Map[String, String] = format match {
    case "csv" => Map("header" -> "true", "timestampFormat" ->
      "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    case _ => Map.empty
  }
}
