package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for [[graft.ops.Bpe.learnMerges]]'s truncation cadence
  * (`spark.graft.bpe.truncateEvery`): learn `rounds` merges over the
  * documents table and report wall time. A tokenizer trains thousands
  * of merges, so the loop's per-round overhead (one localCheckpoint
  * write per round at cadence 1) dominates long before the corpus
  * does — this probe measures the cadence knob at real round counts
  * instead of arguing about it.
  *
  * Usage: graft.tools.BpeBench <sfDir> <rounds> <every> [samples]
  * Prints one JSON line with per-sample seconds and the learned-merge
  * count (all cadences must learn the SAME merges — asserted by the
  * cadence spec; here the count is a cheap tripwire). */
object BpeBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(1000)
    val every = args.lift(2).map(_.toInt).getOrElse(
      graft.ops.Bpe.DefaultTruncateEvery)
    val samples = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.session(cpus)
    spark.conf.set(graft.ops.Bpe.TruncateEveryConfKey, every.toString)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val times = (0 until samples).map { _ =>
      val t0 = System.nanoTime()
      val n = graft.ops.Bpe.learnMerges(docs, "text", rounds).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, n)
    }
    println(f"""{"tool":"BpeBench","sf":"$sfDir","rounds":$rounds,""" +
      f""""every":$every,"merges":${times.head._2},""" +
      s""""samples":[${times.map(t => f"${t._1}%.2f").mkString(",")}],""" +
      f""""min_sec":${times.map(_._1).min}%.2f}""")
    spark.stop()
  }
}
