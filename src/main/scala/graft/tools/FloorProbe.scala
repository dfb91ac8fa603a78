package graft.tools
import org.apache.spark.sql.SparkSession

/** Decompose the sub-second h2h floor: for each named query, warm
  * wall time split into (a) DataFrame construction (query function —
  * plan building + analysis of each operator), (b) optimization +
  * physical planning + codegen (forcing executedPlan), (c) execution
  * (count on the prepared frame). Tells whether the remaining floor
  * is driver-side Catalyst work or scheduling/execution.
  *
  * Usage: runMain graft.tools.FloorProbe <sfDir> [query ...]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_string_agg", "q_skew_join", "q_sample_stratified",
        "q_macros", "q_null_safe", "q_having", "q_topk")
    val b = SparkSession.builder().master("local[32]").appName("floor")
    graft.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    b.config("spark.sql.shuffle.partitions", "32")
    b.config("spark.ui.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm everything once
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val build = ms(t0)
      val t1 = System.nanoTime()
      val ep = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan
      val _ = ep.toString // force full prep
      val plan = ms(t1)
      val t2 = System.nanoTime()
      df.count()
      val exec = ms(t2)
      println(f"FLOOR $name%-22s build=$build%7.1f ms plan=$plan%7.1f ms " +
        f"exec=$exec%7.1f ms total=${build + plan + exec}%7.1f ms")
    }
    spark.stop()
  }
}
