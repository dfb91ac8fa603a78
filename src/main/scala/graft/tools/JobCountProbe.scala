package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Diagnostic for the DuckDB head-to-head floor: per named query, how
  * many Spark JOBS / STAGES / TASKS one `collect()`-style evaluation
  * launches, and its warm wall time. Sub-second plans are dominated by
  * per-job/stage scheduling fixed costs, so the counts ARE the floor —
  * this makes the redundant-action hunt measurable instead of guessed.
  *
  * Usage: runMain graft.tools.JobCountProbe <sfDir> [query ...]
  * (default: the five worst-floor queries from the r9 h2h record).
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_string_agg", "q_skew_join", "q_sample_stratified",
        "q_macros", "q_null_safe")
    val b = SparkSession.builder().master("local[32]").appName("jobcount")
    graft.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    b.config("spark.sql.shuffle.partitions", "32")
    b.config("spark.ui.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    for (aqe <- Seq("true", "false"); name <- names) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm-up: file listing, code, broadcast
      Thread.sleep(300) // let straggler listener events drain
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROBE aqe=$aqe%-5s $name%-24s jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%3d tasks=${tasks.get}%5d  $sec%6.3f s")
    }
    spark.stop()
  }
}
