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
    graft.functions.HashExprs.md5Long(id.cast("string"), 8) % buckets

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

  /** Stable uniform fraction in [0, 1) from the id's md5 (first 8 hex
    * digits — exact in a double, engine-portable). */
  def hashFrac(id: Column): Column =
    graft.functions.HashExprs.md5Long(id.cast("string"), 8)
      .cast("double") / lit(4294967296.0)

  /** Deterministic importance sampling: keep each row with probability
    * `weight` (per-row column, clamped to [0, 1]; NaN/NULL keep
    * nothing — an unknown weight must not admit rows). Same
    * reproducibility contract as [[deterministicSample]] — membership is
    * a pure function of id and weight, so re-runs, engines, and cluster
    * sizes agree. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    val w = weight.cast("double")
    // NaN guard is explicit: Spark orders NaN above all doubles, so
    // least(greatest(NaN, 0), 1) would otherwise clamp NaN to 1.0.
    val clamped = when(w.isNull || isnan(w), lit(0.0))
      .otherwise(least(greatest(w, lit(0.0)), lit(1.0)))
    df.filter(hashFrac(col(idCol)) < clamped)
  }

  /** Source-mixture rebalancing — the training-data "data mixing" step:
    * downsample strata so the kept corpus moves toward `targetShares`
    * (shares of the ORIGINAL total; no upsampling, rates cap at 1).
    * rate_s = min(1, share_s · N / n_s). One count aggregate; the rates
    * ride back into the plan as literals, so the filter is a pure map
    * pass. Strata not named in the target are dropped. */
  def rebalance(
      df: DataFrame, idCol: String, strataCol: String,
      targetShares: Map[String, Double]): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val total = counts.values.sum
    val rateExpr = targetShares.foldLeft(lit(0.0)) { case (acc, (k, share)) =>
      val n = counts.getOrElse(k, 0L)
      val rate = if (n == 0) 0.0 else math.min(1.0, share * total / n)
      when(col(strataCol) === k, lit(rate)).otherwise(acc)
    }
    weightedSample(df, idCol, rateExpr)
  }
}
