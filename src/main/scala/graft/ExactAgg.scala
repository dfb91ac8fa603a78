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

  /** dsum at a caller-chosen scale — for summing many tiny values
    * (e.g. probability shares), where the default micro-unit scale
    * would floor most of the mass away. The caller owns the headroom
    * check: |x|·scale summed must fit a long. */
  def dsumAt(c: Column, scale: Double): Column = {
    require(scale > 0, "scale must be positive")
    (sum(floor(c * lit(scale)).cast("long")).cast("double") / lit(scale))
      .cast("double")
  }

  /** SQL twin of [[dsumAt]]. The scale is emitted via Double.toString
    * (e.g. "1.0E9") — a lossless SQL literal for ANY double, so the
    * SQL side can never silently use a different scale than the Spark
    * side (fixed-decimal formatting would corrupt e.g. 1e-3 to 0.0). */
  def sqlSumAt(x: String, scale: Double): String = {
    require(scale > 0, "scale must be positive")
    s"CAST(CAST(SUM(CAST(FLOOR(($x) * ${scale}) AS BIGINT)) AS DOUBLE) / ${scale} AS DOUBLE)"
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
