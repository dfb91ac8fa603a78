package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join handling (on by default in graft sessions) splits
  * oversized shuffle partitions at runtime; explicit salting is the
  * plan-level tool for the pathological cases AQE can't fix (e.g. one key
  * that is 30% of a 100 TB fact table). The fact side gets a
  * deterministic salt in [0, n); the dimension side is exploded n× so
  * every (key, salt) bucket finds its match. Join cardinality and results
  * are unchanged; the hot key's rows spread across n reducers.
  */
object Skew {

  /** Deterministic per-row salt: stable under retries (hash of the whole
    * row, not rand()) so speculative/re-run tasks salt identically. */
  private def rowSalt(df: DataFrame, n: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col): _*)), lit(n)).cast("int")

  /** Salted equi-join: `facts` (large, possibly skewed) joined to `dims`
    * (small enough to tolerate n× duplication) on `key`. */
  def saltedJoin(
      facts: DataFrame,
      dims: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedFacts = facts.withColumn("__salt", rowSalt(facts, saltFactor))
    val explodedDims = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFacts.join(explodedDims, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Skewed-aggregate: two-phase (partial by (key, salt), then final by
    * key) so one hot group cannot pin a single reducer. Aggregations must
    * be algebraic (sum/count/min/max — re-aggregatable partials). */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, saltFactor))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }
}
