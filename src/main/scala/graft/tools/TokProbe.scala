package graft.tools

import org.apache.spark.sql.functions._

/** CPU attribution for the text preprocessing chain (r14): times the
  * tokenize / shingle / minhash / simhash stages over the documents
  * table with a noop sink, 3 reps each (min kept), so the per-stage
  * marginal cost is visible. Usage: runMain graft.tools.TokProbe <sfDir>
  */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Tables.applyAdaptivePolicy(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, dir, "documents").repartition(32)
      .select(col("doc_id"), col("text"))
    def noop(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def best(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val d = df
      val s = (1 to 3).map(_ => noop(d)).min
      println(f"[tokprobe] $label: $s%.3f s")
    }
    val norm = regexp_replace(trim(lower(col("text"))), "\\s+", " ")
    val toks = split(norm, " ", -1)
    val sh3 = graft.ops.Dedup.shingleArray("text", 3)
    best("baseline (id,text)") { docs }
    best("normalize") { docs.select(col("doc_id"), norm.as("n")) }
    best("tokens") { docs.select(col("doc_id"), toks.as("t")) }
    best("shingle3") { docs.select(col("doc_id"), sh3.as("s")) }
    best("shingle3+distinct") {
      docs.select(col("doc_id"), array_distinct(sh3).as("s"))
    }
    best("minhash8(sh3)") {
      docs.select(col("doc_id"),
        graft.functions.HashExprs.minhashSig(sh3, 8).as("m"))
    }
    best("simhash60(tokens)") {
      docs.select(col("doc_id"),
        graft.functions.HashExprs.simhash60(toks).as("h"))
    }
    best("md5(norm)") { docs.select(col("doc_id"), md5(norm).as("f")) }
    spark.stop()
  }
}
