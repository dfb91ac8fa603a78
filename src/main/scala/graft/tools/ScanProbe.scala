package graft.tools

import org.apache.spark.sql.functions._

/** Micro-probe for the single-task scan+repartition stage cost seen in
  * q_simjoin_exact (r14): times isolated fragments of the explode
  * subtree to attribute the 3-4 s single-task stage.
  * Usage: runMain graft.tools.ScanProbe <sfDir>
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Tables.applyAdaptivePolicy(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[scanprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 4000)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    noop(docs)
    time("scan only (noop)") { noop(docs) }
    time("scan+repartition(32) (noop)") { noop(docs.repartition(32)) }
    time("scan+repartition(32) again") { noop(docs.repartition(32)) }
    val toks = array_distinct(graft.ops.Dedup.shingleArray("text", 3))
    time("scan+rep+shingle (noop)") {
      noop(docs.repartition(32).select(col("doc_id"), toks.as("toks")))
    }
    time("scan+rep+shingle+explode+count") {
      noop(docs.repartition(32).select(col("doc_id"), explode(toks).as("t"))
        .groupBy("t").count())
    }
    spark.stop()
  }
}
