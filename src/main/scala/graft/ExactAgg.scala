package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic (partition-order-independent) float reductions.
  *
  * Summing doubles is order-sensitive in the last bits, so a distributed
  * sum can differ run-to-run and engine-to-engine. For oracle-checked
  * aggregates we scale to micro-units with exact IEEE ops (multiply,
  * floor — both bit-identical across engines), sum as 64-bit integers
  * (exact, order-independent), and convert back with a final double
  * division. DuckDB twins are built by [[ExactAgg.sqlSum]] etc.
  *
  * Range: |x| * 1e6 must fit a long after summing — fine for TPC-H-scale
  * monetary values (per-query headroom ~9.2e18 / 1e6 ≈ 9.2e12 in
  * original units per group). All of this is map-side arithmetic; it adds
  * no shuffles and stays inside whole-stage codegen.
  */
object ExactAgg {
  private val Scale = 1e6

  /** Exact scaled integer sum (long). */
  def lsum(c: Column): Column = sum(floor(c * lit(Scale)).cast("long"))

  /** Deterministic sum of a double column, returned as double. */
  def dsum(c: Column): Column = (lsum(c).cast("double") / lit(Scale)).cast("double")

  /** Deterministic average of a double column, returned as double. */
  def davg(c: Column): Column =
    ((lsum(c).cast("double") / lit(Scale)) / count(c).cast("double")).cast("double")

  /** Deterministic sample variance via exact sums of x and x^2 (scaled). */
  def dvarSamp(c: Column): Column = {
    val n = count(c).cast("double")
    val s = lsum(c).cast("double") / lit(Scale)
    val s2 = sum(floor(c * c * lit(Scale)).cast("long")).cast("double") / lit(Scale)
    ((s2 - (s * s) / n) / (n - lit(1.0))).cast("double")
  }

  // DuckDB-side twins (same arithmetic, token-for-token).
  def sqlLSum(x: String): String =
    s"SUM(CAST(FLOOR(($x) * 1000000.0) AS BIGINT))"
  def sqlSum(x: String): String =
    s"CAST(CAST(${sqlLSum(x)} AS DOUBLE) / 1000000.0 AS DOUBLE)"
  def sqlAvg(x: String): String =
    s"CAST(CAST(${sqlLSum(x)} AS DOUBLE) / 1000000.0 / CAST(COUNT($x) AS DOUBLE) AS DOUBLE)"
  def sqlVarSamp(x: String): String =
    s"CAST(((CAST(SUM(CAST(FLOOR(($x) * ($x) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0) - " +
      s"(CAST(${sqlLSum(x)} AS DOUBLE) / 1000000.0) * (CAST(${sqlLSum(x)} AS DOUBLE) / 1000000.0) / CAST(COUNT($x) AS DOUBLE)) " +
      s"/ (CAST(COUNT($x) AS DOUBLE) - 1.0) AS DOUBLE)"
}
