package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Operator-level attribution of a query's warm time: run the query
  * once to warm, once measured, then walk the FINAL (adaptive) physical
  * plan and print every node with its SQL metrics (output rows, codegen
  * duration, shuffle bytes/time). This is the UI's SQL tab for a
  * headless session — tells which operator, not just which stage.
  *
  * Usage: runMain graft.tools.MetricsProbe <sfDir> <query> [query ...]
  */
object MetricsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Tables.applyAdaptivePolicy(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def walk(p: SparkPlan, depth: Int): Unit = {
      val keep = p.metrics.filter { case (_, m) =>
        m.value > 0 && Seq("numOutputRows", "duration", "dataSize",
          "shuffleBytesWritten", "fetchWaitTime", "shuffleWriteTime",
          "time in aggregation build", "sort time", "spill size",
          "build time", "collectTime", "broadcastTime",
          "numFiles", "filesSize", "scanTime").exists(k =>
            m.name.getOrElse("").contains(k) || k == "ignore")
      }
      val ms = p.metrics.toSeq.sortBy(_._1).collect {
        case (k, m) if m.value != 0 => s"$k=${m.value}"
      }.mkString(" ")
      println(("  " * depth) + p.nodeName + "  " + ms)
      val _ = keep
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
      p.subqueries.foreach { sq =>
        println(("  " * (depth + 1)) + "SUBQUERY:")
        walk(sq, depth + 2)
      }
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      val df = fn(spark, dir)
      val t0 = System.nanoTime()
      // Execute the SAME QueryExecution so its SQLMetrics populate
      // (df.count() would build and execute a separate collapsed plan).
      df.queryExecution.executedPlan.execute().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"\n===== $name  warm=$sec%.2f s (executedPlan, incl. final sort) =====")
      walk(df.queryExecution.executedPlan, 0)
    }
    spark.stop()
  }
}
