package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SJProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val b = SparkSession.builder().master("local[32]").appName("sj")
    graft.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    b.config("spark.sql.shuffle.partitions", "32")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 4000)
    (1 to 6).foreach { i =>
      val cap = if (i % 2 == 0) graft.ops.Dedup.UncappedCandidates
                else graft.ops.Dedup.DefaultMaxCandidates
      val label = if (i % 2 == 0) "uncapped" else "guarded "
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.similarityJoinExact(
        df, "doc_id", "text", 60, 3, cap).count()
      println(f"RUN $i $label ${(System.nanoTime()-t0)/1e9}%6.2f s  ($n rows)")
    }
    spark.stop()
  }
}
