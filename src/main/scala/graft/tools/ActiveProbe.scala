package graft.tools
import org.apache.spark.sql.SparkSession
object ActiveProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("32")
    graft.Tables.applyAdaptivePolicy(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def act(): String = {
      val a = SparkSession.getActiveSession
      val d = SparkSession.getDefaultSession
      s"active==(main)=${a.exists(_ eq spark)} default==(main)=${d.exists(_ eq spark)} " +
        a.map(s => "activeAqe=" + s.conf.get("spark.sql.adaptive.enabled") +
          " activeParts=" + s.conf.get("spark.sql.shuffle.partitions")).getOrElse("none")
    }
    println("[probe] before: " + act())
    val pairs = Seq((1L,2L),(2L,3L),(3L,4L),(10L,11L)).toDF("a","b")
    val res = graft.ops.Dedup.duplicateClusters(pairs, "a", "b")
    println("[probe] after dC construction: " + act())
    res.count()
    println("[probe] after dC count: " + act())
    spark.stop()
  }
}
