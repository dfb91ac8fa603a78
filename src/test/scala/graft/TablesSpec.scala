package graft

import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Contract test for the driver-generated testdata layout.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * shipped `events.ts` in two physical layouts (TIMESTAMP(NANOS)-as-long,
  * then Timestamp(isAdjustedToUTC=false, MICROS) which stock Spark infers
  * as timestamp_ntz). [[Tables.load]] must normalize every layout to plain
  * TimestampType — if a future regeneration changes the layout again, this
  * spec fails with a named assertion instead of 8 queries crashing on
  * `unix_micros(DATATYPE_MISMATCH)`.
  */
class TablesSpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1").map("/root/testdata/" + _)

  test("events.ts normalizes to TimestampType in every sf dir") {
    sfDirs.foreach { dir =>
      val ts = Tables.load(spark, dir, "events").schema("ts")
      assert(ts.dataType == TimestampType, s"$dir/events.parquet: ts read as ${ts.dataType}")
    }
  }

  test("unix_micros(ts) resolves and is monotone-safe on events") {
    // The exact call every temporal query makes; fails analysis if ts is NTZ.
    val row = Tables.load(spark, sfDir, "events")
      .selectExpr("min(unix_micros(ts)) AS lo", "max(unix_micros(ts)) AS hi")
      .head()
    assert(!row.isNullAt(0) && row.getLong(0) <= row.getLong(1))
  }

  test("all tables load with stable key-column types") {
    val expected = Map(
      "region" -> ("r_regionkey", IntegerType),
      "nation" -> ("n_nationkey", IntegerType),
      "customer" -> ("c_custkey", LongType),
      "supplier" -> ("s_suppkey", LongType),
      "part" -> ("p_partkey", LongType),
      "orders" -> ("o_orderdate", TimestampType),
      "lineitem" -> ("l_shipdate", TimestampType),
      "events" -> ("ts", TimestampType),
      "documents" -> ("doc_id", LongType),
      "embeddings" -> ("vec_id", LongType))
    Tables.names.foreach { t =>
      val schema = Tables.load(spark, sfDir, t).schema
      val (colName, colType) = expected(t)
      assert(schema.fieldNames.contains(colName), s"$t missing $colName")
      assert(schema(colName).dataType == colType,
        s"$t.$colName read as ${schema(colName).dataType}, expected $colType")
    }
  }
}
