package graft.tools

/** Same-session A/B of optimizer-rule exclusions (r14): for each named
  * query, alternate legs with and without the exclusions, 2 samples per
  * leg per round. Usage:
  *   runMain graft.tools.RuleAB <sfDir> <mode> <query ...>
  * mode: gen | constraints | both
  */
object RuleAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val names = args.drop(2).toSeq
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Tables.applyAdaptivePolicy(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val genRule =
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    val conRule =
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints"
    def setLeg(on: Boolean): Unit = mode match {
      case "gen" =>
        if (on) spark.conf.set("spark.sql.optimizer.excludedRules", genRule)
        else spark.conf.unset("spark.sql.optimizer.excludedRules")
      case "constraints" =>
        spark.conf.set("spark.sql.constraintPropagation.enabled",
          (!on).toString)
      case "infercon" =>
        // baseline keeps the (default, r14) gen exclusion on BOTH legs;
        // the test leg additionally excludes InferFiltersFromConstraints
        spark.conf.set("spark.sql.optimizer.excludedRules",
          if (on) s"$genRule,$conRule" else genRule)
      case "loopaqe" =>
        // baseline = pre-r14 behavior (AQE stays on inside loop
        // clones); "excluded" = the r14 default (AQE off in the clone)
        if (on) sys.props.remove("spark.graft.loop.aqe")
        else sys.props("spark.graft.loop.aqe") = "on"
        ()
      case "realstats" =>
        // baseline = r14 behavior (truncated leaves carry the default
        // sizeInBytes); test = r15 measured statistics
        spark.conf.set(graft.Checkpoints.RealStatsConfKey, on.toString)
      case "ccaqe" =>
        // baseline = r14 behavior (connectedComponents keeps AQE in its
        // loop clone); test = AQE off, static broadcasts from the r15
        // measured stats carrying the star joins. Both legs keep
        // realStats at its default (on).
        spark.conf.set("spark.graft.cc.keepAqe", (!on).toString)
      case other => sys.error(s"unknown mode $other")
    }
    def sample(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      // warm both legs once (codegen, landing)
      setLeg(false); sample(name); setLeg(true); sample(name)
      val res = (1 to 3).flatMap { _ =>
        Seq(false, true).map { leg =>
          setLeg(leg)
          val s = math.min(sample(name), sample(name))
          (leg, s)
        }
      }
      val off = res.filter(!_._1).map(_._2)
      val on = res.filter(_._1).map(_._2)
      println(f"[ruleab] $name mode=$mode baseline=${off.sorted.apply(off.size / 2)}%.2f s " +
        f"excluded=${on.sorted.apply(on.size / 2)}%.2f s " +
        f"(baseline=${off.map(v => f"$v%.2f").mkString(",")} vs excluded=${on.map(v => f"$v%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
