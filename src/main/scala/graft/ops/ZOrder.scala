package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-column clustering — the data-skipping layout
  * for queries that filter on TWO dimensions at once (user × time,
  * domain × date): linearize the 2-D key space along the Z-curve, then
  * range-partition + sort files by the z-value, so a 2-D selective
  * filter touches the few files whose z-range intersects the query box
  * instead of every file a single-column sort would smear it across.
  * This is Delta/Iceberg `OPTIMIZE ZORDER BY` re-expressed: the engine
  * keeps parquet min/max stats per file, and the curve makes BOTH
  * dimensions' stats tight simultaneously.
  *
  * Everything is exact 64-bit integer arithmetic — range bucketing is
  * `((x − min) · 2^bits) div (max − min + 1)` (order-preserving, the
  * BM25 two-scalar-collect idiom for min/max) and interleaving is an
  * unrolled shift/mask sum — so the z-values are reproducible on any
  * engine and partitioning, and a DuckDB oracle can re-derive them
  * bit-for-bit. Headroom: (max − min) · 2^bits must stay < 2^63 —
  * bits=16 leaves room for spreads up to ~1.4·10^14 (a 4-year micros
  * range); shrink bits for wider domains. NULLs in either column
  * bucket to 0 (they cluster together at the curve origin, which is
  * exactly where a scan can skip them).
  */
object ZOrder {

  /** Order-preserving integral bucket of `x` into [0, 2^bits):
    * ((x − min) · 2^bits) div (max − min + 1). Values outside
    * [min, max] are clamped (late rows after the stats collect must
    * not produce out-of-range buckets). */
  def bucket(x: Column, min: Long, max: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits in [1, 31]")
    val span = max - min + 1
    require(span > 0, "max must be >= min")
    require(span <= (Long.MaxValue >> bits),
      s"(max - min) * 2^$bits overflows long — shrink bits")
    // least/greatest SKIP nulls (least(NULL, max) = max), which would
    // silently bucket NULLs to the top — gate them through explicitly
    // so NULL propagates and withZValue's coalesce sends it to 0
    val xl = x.cast("long")
    val clamped = when(xl.isNull, xl)
      .otherwise(greatest(least(xl, lit(max)), lit(min)))
    // IntegralDivide (`div`), never `/` — the rrfFuse/prioritySample
    // lesson: Column `/` on longs is DOUBLE division and (x·2^bits)
    // exceeds 2^53, where doubles drop integer exactness
    call_function("div",
      (clamped - lit(min)) * lit(1L << bits), lit(span))
  }

  /** Morton interleave of two bucket columns (each in [0, 2^bits)):
    * bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1. Unrolled
    * shift/mask sum — one codegen'd projection, no UDF. */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits in [1, 31]")
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i) bitwiseAND lit(1L), 2 * i)) +
        (shiftleft(shiftright(b, i) bitwiseAND lit(1L), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** Add a `__z` column: the Morton value of (colA, colB) bucketed by
    * their actual min/max — collected once as four driver scalars (the
    * bounded-collect discipline; never the data). NULLs bucket to 0. */
  def withZValue(
      df: DataFrame, colA: String, colB: String, bits: Int = 16): DataFrame = {
    val stats = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    // A dimension that is ALL NULL (or an empty frame) degrades to
    // constant bucket 0 on that side only — the healthy column still
    // clusters (collapsing the whole z to 0 would also collapse the
    // numFiles range partitioning into one giant file)
    def side(c: String, lo: Int): Column =
      if (stats.isNullAt(lo)) lit(0L)
      else coalesce(
        bucket(col(c), stats.getLong(lo), stats.getLong(lo + 1), bits),
        lit(0L))
    df.withColumn("__z", interleave(side(colA, 0), side(colB, 2), bits))
  }
}
