package graft.queries

import graft.SparkSpec

class ExtraQueriesSpec extends SparkSpec {

  test("rollup emits subtotal and grand-total rows") {
    val rows = ExtraQueries.queries("q_rollup")(spark, sfDir).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val subtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(subtotals.length == 3) // one per returnflag
    assert(grand.head.getAs[Long]("n") == rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(_.getAs[Long]("n")).sum)
  }

  test("rollup over an EMPTY input emits zero rows (Spark deviates from " +
      "ANSI here — pinned so the contract is explicit)") {
    // Caught by tools/FuzzDiff gen-2 seed 11 (f_rollup_0069): the ANSI
    // expansion of ROLLUP(a, b) includes the () grouping set, which
    // aggregates globally and must yield ONE cnt=0 row even over an
    // empty input — DuckDB/Postgres do. Spark's Expand+Aggregate
    // grouping-sets plan groups by the synthetic grouping id, so an
    // empty input yields ZERO rows. graft inherits Spark's semantics;
    // callers needing the ANSI grand-total row on possibly-empty
    // inputs must union the () set explicitly (second assertion).
    val empty = spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM VALUES ('F', '1-URGENT') AS t(o_orderstatus, o_orderpriority)
        |WHERE o_orderstatus = 'NOPE'
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin)
    assert(empty.count() == 0L) // ANSI/DuckDB would return 1 row, n=0
    val explicitGrand = spark.sql(
      """SELECT NULL AS o_orderstatus, NULL AS o_orderpriority, COUNT(*) AS n
        |FROM VALUES ('F', '1-URGENT') AS t(o_orderstatus, o_orderpriority)
        |WHERE o_orderstatus = 'NOPE'""".stripMargin)
    assert(explicitGrand.count() == 1L)
    assert(explicitGrand.collect().head.getAs[Long]("n") == 0L)
  }

  test("decimal down-scale cast rounds half-up (DuckDB's truncates — " +
      "pinned so the contract is explicit)") {
    // Caught by tools/FuzzDiff gen-3 seed 7 (f_decimal_0004 et al.):
    // Spark's decimal→decimal down-scale CAST rounds HALF_UP (half away
    // from zero), DuckDB's cast TRUNCATES toward zero (0.15 → 0.1;
    // probed directly: 0.05→0.0, 0.25→0.2, -0.15→-0.1). Both engines'
    // ROUND(x, s) agree (half away from zero), so every shared surface
    // — the fuzzer's decimal family and any oracle SQL that narrows a
    // decimal — must down-scale through ROUND, never a bare CAST.
    // graft inherits Spark's cast semantics; this spec pins them.
    val r = spark.sql(
      """SELECT CAST(CAST(v AS DECIMAL(18,2)) AS DECIMAL(18,1)) AS c,
        |       CAST(ROUND(CAST(v AS DECIMAL(18,2)), 1) AS DECIMAL(18,1)) AS rd
        |FROM VALUES ('0.05'), ('0.15'), ('0.25'), ('-0.15') AS t(v)
        |ORDER BY v""".stripMargin)
      .collect().map(row => (row.getDecimal(0).toPlainString,
        row.getDecimal(1).toPlainString))
    // cast: half-up everywhere (DuckDB cast would give 0.0/0.1/0.2/-0.1)
    assert(r.toSeq == Seq(("-0.2", "-0.2"), ("0.1", "0.1"),
      ("0.2", "0.2"), ("0.3", "0.3")))
  }

  test("cube emits all grouping combinations") {
    val rows = ExtraQueries.queries("q_cube")(spark, sfDir).collect()
    // 3 statuses x 5 priorities + 3 + 5 + 1 grand total
    assert(rows.length == 24)
  }

  test("approx distinct stays within the configured error bound") {
    // the query's within_bound column IS the 5% contract, computed from
    // Spark's own HLL++ sketch; the exact count pins the groups
    val rows = ExtraQueries.queries("q_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0)
      assert(r.getAs[Boolean]("within_bound"),
        s"HLL estimate off by >5% for ${r.getString(0)}")
    }
  }

  test("percentiles are actual data values and ordered") {
    val rows = ExtraQueries.queries("q_percentiles")(spark, sfDir).collect()
    rows.foreach { r =>
      val (q25, q50, q90) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(q25 <= q50 && q50 <= q90)
      assert(q25 == math.floor(q25)) // quantities are integral doubles
    }
  }
}
