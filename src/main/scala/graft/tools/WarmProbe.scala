package graft.tools

/** Warm-run decomposition: run one query K times in one JVM and print
  * every sample. Separates landing/JIT warm-up slope from the steady
  * state that scale comparisons should use — Bench's min-of-2 (plus
  * contention resampling) can compare queries at DIFFERENT points on
  * their warm-up curve when the curve is steep (seen on the 30×
  * streaming family: samples 124.9 → 16.5 → 7.9 → 4.5 s).
  *
  * Usage: graft.tools.WarmProbe <sfDir> <query> [k]
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val k = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Tables.applyAdaptivePolicy(spark)
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to k).map { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[warm] $name sample $i: $sec%.2f s")
      sec
    }
    println(s"""{"query":"$name","sf":"$dir","samples":[""" +
      times.map(t => f"$t%.2f").mkString(",") + "]}")
    spark.stop()
  }
}
