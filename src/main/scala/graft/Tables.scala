package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Parquet catalog for one scale-factor directory of the driver-generated
  * testdata (TPC-H-ish star schema + events/documents/embeddings).
  *
  * Registers each table as a temp view so both the DataFrame API and
  * `spark.sql` can reach them. Reads are plain parquet scans: column
  * pruning and predicate pushdown stay available to Catalyst (the same
  * layout a 100 TB lake would use, just bigger files and a partitioned
  * directory scheme).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, table: String): String = s"$dir/$table.parquet"

  /** Sessions must set spark.sql.legacy.parquet.nanosAsLong=true (see
    * [[configure]]): events.ts is TIMESTAMP(NANOS), which Spark has no
    * native type for. We read it as long nanos and floor-divide to
    * micros — the same truncation DuckDB applies — restoring TimestampType.
    */
  def load(spark: SparkSession, dir: String, table: String): DataFrame = {
    val df = spark.read.parquet(path(dir, table))
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }

  /** Session configs required to read the testdata. Apply on every builder. */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.extensions" -> "graft.GraftExtensions")

  /** Register all tables as temp views for SQL access. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { t =>
      load(spark, dir, t).createOrReplaceTempView(t)
    }
}
