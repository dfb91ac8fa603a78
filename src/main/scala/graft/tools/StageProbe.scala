package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Per-stage decomposition of a query's warm wall time (guide §1/§7:
  * find WHERE the time goes before touching anything). For each named
  * query: one warm-up evaluation, then one measured evaluation with a
  * listener recording every job (wall) and every stage (task-time sum,
  * task count, shuffle read/write bytes, name). Stages sorted by wall
  * contribution tell which exchange/scan/agg to attack.
  *
  * Usage: runMain graft.tools.StageProbe <sfDir> <query> [query ...]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Tables.applyAdaptivePolicy(spark)
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(name: String, wallMs: Long, taskMs: Long,
        tasks: Int, shRead: Long, shWrite: Long, input: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long)]
    val jobStart = mutable.Map.empty[Int, Long]
    // stageId -> the setJobDescription label of the job that ran it
    // (operators label their eager phases per guide §1.5; stages with
    // no label print "-")
    val stageDesc = mutable.Map.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobStart(j.jobId) = j.time
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("-")
        j.stageIds.foreach(sid => stageDesc(sid) = d)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach(t0 => jobs += ((j.jobId, j.time - t0)))
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(0L)
        val m = i.taskMetrics
        val desc = stageDesc.getOrElse(i.stageId, "-")
        stages += St(desc.take(40) + " | " + i.name.takeWhile(_ != '\n'),
          wall, m.executorRunTime,
          i.numTasks, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead)
      }
    })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      Thread.sleep(400)
      stages.clear(); jobs.clear(); jobStart.clear(); stageDesc.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"\n===== $name  warm=$sec%.2f s  jobs=${jobs.size}  " +
        f"stages=${stages.size}  jobWallSum=${jobs.map(_._2).sum / 1e3}%.2f s")
      stages.sortBy(-_.wallMs).take(25).foreach { s =>
        println(f"  ${s.wallMs}%6d ms wall  ${s.taskMs}%7d ms task  " +
          f"${s.tasks}%4d t  shR=${s.shRead / 1024}%8d KiB " +
          f"shW=${s.shWrite / 1024}%8d KiB in=${s.input / 1024}%8d KiB  ${s.name}")
      }
    }
    spark.stop()
  }
}
