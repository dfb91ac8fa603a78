package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus sampling for training-data pipelines.
  *
  * The workhorse is *deterministic hash sampling*: membership is a pure
  * function of the row's id, so samples are reproducible across runs,
  * engines, and cluster sizes, subsets nest (a 5% sample is contained in
  * the 10% sample), and resuming a pipeline never re-rolls the dice.
  * RNG-based sampling (sample/sampleBy) is kept for statistical use but
  * is seed+partitioning dependent.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the id's md5. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Deterministic pct% sample (0-100) keyed on `idCol`. */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct in [0,100]")
    df.filter(hashBucket(col(idCol)) < pct)
  }

  /** Deterministic per-stratum sampling: fractions as percent per value
    * of `strataCol` (missing strata keep nothing). */
  def deterministicStratified(
      df: DataFrame, idCol: String, strataCol: String,
      pctByStratum: Map[String, Int]): DataFrame = {
    val pctExpr = pctByStratum.foldLeft(lit(0)) { case (acc, (k, p)) =>
      when(col(strataCol) === k, p).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < pctExpr)
  }

  /** RNG reservoir-style fraction sample (Spark-native, seeded). */
  def randomSample(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)
}
