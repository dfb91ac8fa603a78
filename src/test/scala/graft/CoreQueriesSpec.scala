package graft

import graft.queries.CoreQueries

/** Smoke + targeted value checks for the core relational surface.
  * Full value-level correctness is the driver's DuckDB oracle gate;
  * these specs catch regressions fast and pin a few known values.
  */
class CoreQueriesSpec extends SparkSpec {

  test("every core query runs and returns a sane schema") {
    CoreQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")
      val n = df.count()
      assert(n >= 0, s"$name: count failed")
      // q_anti_join may legitimately be empty at tiny SF.
      if (name != "q_anti_join") assert(n > 0, s"$name: no rows")
    }
  }

  test("every query has either an oracle or a documented rows-only status") {
    val missing = CoreQueries.queries.keySet -- CoreQueries.oracleSql.keySet
    assert(missing.isEmpty, s"core queries without oracle: $missing")
  }

  test("q_agg aggregates are exact and positive") {
    val rows = CoreQueries.queries("q_agg")(spark, sfDir).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus in testdata
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("avg_disc") >= 0 && r.getAs[Double]("avg_disc") <= 0.1)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q_window_dedupe keeps exactly one row per user") {
    val df = CoreQueries.queries("q_window_dedupe")(spark, sfDir)
    val users = df.select("user_id").collect().map(_.getLong(0))
    assert(users.distinct.length == users.length)
  }

  test("q_topk is sorted descending by price") {
    val prices = CoreQueries.queries("q_topk")(spark, sfDir)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 100)
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q_sessionize session numbering starts at 1 per user") {
    val df = CoreQueries.queries("q_sessionize")(spark, sfDir)
    val firstSess = df.groupBy("user_id").min("session_num").collect()
    assert(firstSess.forall(_.getLong(1) == 1L))
  }
}
