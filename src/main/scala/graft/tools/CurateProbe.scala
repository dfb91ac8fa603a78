package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Dev probe for the q_curate_pipeline composition (r15): reproduce the
  * contamination stage's input shape (cached deduped frame ∪ eval scan,
  * exactly what CurationPipeline.curate feeds Dedup.contaminationPairs)
  * and print the FINAL adaptive plan after execution, so exchange-reuse
  * claims are checked against runtime reality instead of the initial
  * (isFinalPlan=false) explain. Usage: runMain graft.tools.CurateProbe <sfDir>
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Tables.applyAdaptivePolicy(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
      case q: QueryStageExec => finalPlan(q.plan)
      case other => other
    }
    def show(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.executedPlan.execute().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"\n===== $tag  $sec%.2f s =====")
      def walk(p: SparkPlan, d: Int): Unit = {
        println(("  " * d) + p.nodeName +
          p.metrics.get("numOutputRows").map(m => s"  rows=${m.value}").getOrElse(""))
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan, d + 1)
          case q: QueryStageExec => walk(q.plan, d + 1)
          case _ => p.children.foreach(walk(_, d + 1))
        }
      }
      walk(df.queryExecution.executedPlan, 0)
    }

    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val evalFlag = coalesce(col("doc_id") % 31 === 0, lit(false))
    def trainSideFull(all: org.apache.spark.sql.DataFrame,
        flag: org.apache.spark.sql.Column) = all.filter(!flag)

    // Shape A: the standalone q_contamination shape (plain scan input)
    val a = graft.ops.Dedup.contaminationPairs(
      docs, "doc_id", "text", 7, evalFlag, 3, 100)
    show("A: plain scan input", a)

    // Shape B: curate's shape — cached deduped frame ∪ eval side
    val evalSide = docs.filter(evalFlag)
    val trainSide = docs.filter(!evalFlag)
    val deduped = trainSide.limit(1000000).cache() // stand-in cached frame
    val b = graft.ops.Dedup.contaminationPairs(
      deduped.unionByName(evalSide), "doc_id", "text", 7, evalFlag, 3, 100)
    show("B: cached-union input (curate shape)", b)
    deduped.unpersist()

    // Shape C: the candidate fix — a TRUNCATED (LogicalRDD) deduped
    // frame instead of a cached one; LogicalRDD leaves canonicalize by
    // RDD, so the two sides' exchanges should be reusable again.
    val dedupedT = graft.Checkpoints.truncate(trainSide.limit(1000000))
    val c = graft.ops.Dedup.contaminationPairs(
      dedupedT.unionByName(evalSide), "doc_id", "text", 7, evalFlag, 3, 100)
    show("C: truncated-union input (candidate fix)", c)

    // Shape D: the REAL pipeline subtree up to `scored` (CurationPipeline
    // internals replicated 1:1) — the composition whose truncation job
    // still ran the shingle exchange twice after shapes A–C said it
    // shouldn't.
    {
      val allDocs = graft.Tables.load(spark, dir, "documents")
      val exactKept = graft.Checkpoints.truncate(trainSideFull(allDocs, evalFlag).join(
        graft.ops.Dedup.exact(trainSideFull(allDocs, evalFlag), "doc_id", "text")
          .select(col("doc_id")),
        Seq("doc_id"), "left_semi"))
      val pairs = graft.ops.Dedup.minHashLsh(exactKept, "doc_id", "text",
        3, 8, 2, Int.MaxValue)
      val clusters = graft.ops.Dedup.duplicateClusters(pairs, "a", "b")
      val nearDropped = clusters.filter(col("a") =!= col("cluster"))
        .select(col("a").as("doc_id"))
      val deduped = graft.Checkpoints.truncate(
        exactKept.join(nearDropped, Seq("doc_id"), "left_anti"))
      val evalSideFull = allDocs.filter(evalFlag)
      val contaminated = graft.ops.Dedup.contaminationPairs(
        deduped.unionByName(evalSideFull), "doc_id", "text", 7,
        evalFlag, 3, 100)
        .select(col("doc_id")).distinct()
      val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      val scored = clean
        .withColumn("quality", graft.ops.TextOps.qualityScore(col("text")))
        .filter(col("quality") >= 0.3)
      show("D: real scored subtree", scored)

      // Why didn't the two shingle exchanges reuse? Compare their
      // canonicalized plans node by node and print the first diff.
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec
      def collectShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[ShuffleExchangeExec]
        def go(q: SparkPlan): Unit = {
          q match {
            case s: ShuffleQueryStageExec =>
              s.plan match {
                case e: ShuffleExchangeExec => out += e
                case other => ()
              }
            case a: AdaptiveSparkPlanExec => go(a.executedPlan)
            case _ => ()
          }
          q match {
            case a: AdaptiveSparkPlanExec => ()
            case qs: QueryStageExec => go(qs.plan)
            case _ => q.children.foreach(go)
          }
        }
        go(p)
        out.toSeq
      }
      val shuffles = collectShuffles(scored.queryExecution.executedPlan)
      println(s"\nshuffle exchanges found: ${shuffles.size}")
      def firstDiff(a: SparkPlan, b: SparkPlan, path: String): Unit = {
        if (a.getClass != b.getClass) {
          println(s"DIFF at $path: ${a.nodeName} vs ${b.nodeName}")
        } else if (a.children.size != b.children.size) {
          println(s"DIFF at $path: child count ${a.children.size} vs ${b.children.size} (${a.nodeName})")
        } else {
          val sa = a.simpleString(1000); val sb = b.simpleString(1000)
          if (sa != sb) println(s"DIFF at $path (${a.nodeName}):\n  A: $sa\n  B: $sb")
          a.children.zip(b.children).zipWithIndex.foreach { case ((ca, cb), i) =>
            firstDiff(ca, cb, s"$path/$i")
          }
        }
      }
      shuffles.zipWithIndex.foreach { case (e, i) =>
        println(s"  [$i] ${e.simpleString(200)}  (canonical size ${e.canonicalized.toString.length})")
      }
      // Shape E: curate's fix candidate — minimal 2-column union input
      val contaminatedE = graft.ops.Dedup.contaminationPairs(
        deduped.select(col("doc_id"), col("text"))
          .unionByName(evalSideFull.select(col("doc_id"), col("text"))),
        "doc_id", "text", 7, evalFlag, 3, 100)
        .select(col("doc_id")).distinct()
      val cleanE = deduped.join(contaminatedE, Seq("doc_id"), "left_anti")
      val scoredE = cleanE
        .withColumn("quality", graft.ops.TextOps.qualityScore(col("text")))
        .filter(col("quality") >= 0.3)
      show("E: scored with 2-col contamination union", scoredE)
      // the shingle exchanges contain a Generate below them
      val shingleEx = shuffles.filter(_.exists {
        case _: org.apache.spark.sql.execution.GenerateExec => true
        case _ => false
      })
      println(s"shingle exchanges: ${shingleEx.size}")
      if (shingleEx.size == 2) {
        println(s"sameResult: ${shingleEx(0).sameResult(shingleEx(1))}")
        firstDiff(shingleEx(0).canonicalized, shingleEx(1).canonicalized, "")
        println("--- full canonical A ---")
        println(shingleEx(0).canonicalized.treeString.take(4000))
        println("--- full canonical B ---")
        println(shingleEx(1).canonicalized.treeString.take(4000))
      }
    }

    spark.stop()
  }
}
