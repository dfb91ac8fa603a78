package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-preserving, skew-robust bucket assignment — the shared
  * machinery behind every "distributed prefix sum" operator
  * ([[Curation.packSequences]], [[Curation.tokenBudget]]).
  *
  * The problem: a running sum over a whole partition-by group is a
  * single-task sort+scan — at 100 TB one group is billions of rows
  * through one task. The fix is two-level: cut each group into
  * `numBuckets` contiguous-in-sort-order buckets, prefix-sum the tiny
  * per-bucket totals, broadcast them back, and window only WITHIN a
  * (group, bucket) — all buckets proceed in parallel.
  *
  * Bucket boundaries come from a distributed quantile sketch
  * (`percentile_approx`) of the sort key, NOT from fixed-width key
  * ranges: cut points adapt to the key's actual distribution, so
  * buckets stay balanced for dense lake sequence ids and sparse
  * hash-derived ids alike — no uniformity assumption, no driver-side
  * min/max pass, no width arithmetic to overflow. The sketch aggregate
  * is map-side partial (one KB-scale summary per partition crosses the
  * wire), and the resulting cut table (groups × numBuckets scalars) is
  * broadcast.
  *
  * Correctness does NOT depend on where the cuts land: assignment is
  * "number of cut points strictly below the key", which is monotone
  * non-decreasing in the key and gives equal keys the same bucket — so
  * any downstream per-bucket prefix sum composed with the exclusive
  * bucket-total prefix is EXACTLY the flat single-partition running sum,
  * for any sketch outcome. The sketch only controls balance, never
  * values.
  */
object Bucketing {

  /** The bucket column added by [[quantileBuckets]]. */
  val BucketCol = "__bucket"

  /** Assign each row a bucket in [0, numBuckets) per `groupCols` group,
    * monotone non-decreasing in the caller's sort order over the
    * numeric `key` (equal keys share a bucket):
    *
    *   - `descending=false`: bucket = cut points strictly BELOW key —
    *     monotone in ascending key order; NaN (which Spark sorts as the
    *     largest double) lands in the last bucket because every cut
    *     compares below it.
    *   - `descending=true`: bucket = cut points strictly ABOVE key —
    *     the key is NOT negated (negation breaks NaN: -NaN = NaN would
    *     land a desc-first NaN in the last bucket); NaN lands in bucket
    *     0, matching desc-first ordering.
    *   - null keys go to bucket 0 (`nullsFirst`) or the last bucket,
    *     matching the caller's NULLS FIRST/LAST window ordering — a
    *     misplaced null bucket would silently corrupt downstream
    *     prefix sums for every null-key row.
    *
    * `groupCols` may be empty (one global group) and may contain nulls
    * (null groups are matched null-safely). */
  def quantileBuckets(
      df: DataFrame, key: Column, groupCols: Seq[String],
      numBuckets: Int, descending: Boolean = false,
      nullsFirst: Boolean = true): DataFrame = {
    require(numBuckets >= 1, "numBuckets must be >= 1")
    if (numBuckets == 1) return df.withColumn(BucketCol, lit(0))
    val k = df.withColumn("__qkey", key.cast("double"))
    val keyed = if (groupCols.nonEmpty) k else k.withColumn("__qgrp", lit(0))
    val gcols = if (groupCols.nonEmpty) groupCols else Seq("__qgrp")
    val pcts = array(
      (1 until numBuckets).map(i => lit(i.toDouble / numBuckets)): _*)
    // rank error ~1/accuracy; 10k keeps it far below a 1/numBuckets slot
    // (percentile_approx ignores null keys — they get an explicit
    // bucket below, not a cut-derived one)
    val cuts = keyed.groupBy(gcols.map(col): _*)
      .agg(percentile_approx(col("__qkey"), pcts, lit(10000)).as("__qcuts"))
      .select(gcols.zipWithIndex.map { case (g, i) =>
        col(g).as(s"__qg$i") } :+ col("__qcuts"): _*)
    // null-safe equality: a NULL group value is a legitimate group (the
    // usingColumns join form would silently drop those rows)
    val cond = gcols.zipWithIndex
      .map { case (g, i) => keyed(g) <=> cuts(s"__qg$i") }
      .reduce(_ && _)
    val nullBucket = if (nullsFirst) 0 else numBuckets - 1
    val cutCount =
      if (descending) size(filter(col("__qcuts"), c => c > col("__qkey")))
      else size(filter(col("__qcuts"), c => c < col("__qkey")))
    keyed.join(broadcast(cuts), cond)
      .withColumn(BucketCol,
        when(col("__qkey").isNull, lit(nullBucket)).otherwise(cutCount))
      .drop("__qkey" +: "__qcuts" +: "__qgrp" +:
        gcols.indices.map(i => s"__qg$i"): _*)
  }

  /** The tiny second level: per-(group, bucket) totals of `value`,
    * prefix-summed EXCLUSIVELY over buckets within each group. The
    * window runs over groups × numBuckets summary rows — for an empty
    * `groupCols` that is a deliberate single trivial partition of
    * numBuckets rows, never corpus rows. Output: groupCols ++
    * (__bucket, __boffset). */
  def bucketOffsets(
      bucketed: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame = {
    val w =
      if (groupCols.nonEmpty)
        Window.partitionBy(groupCols.map(col): _*).orderBy(col(BucketCol))
      else Window.orderBy(col(BucketCol))
    bucketed.groupBy((groupCols :+ BucketCol).map(col): _*)
      .agg(sum(value).as("__btotal"))
      .withColumn("__boffset",
        coalesce(sum(col("__btotal")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__btotal")
  }

  /** Broadcast the offsets back onto the bucketed rows, null-safely on
    * the group columns (plus the bucket). */
  def joinOffsets(
      bucketed: DataFrame, offsets: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val keys = groupCols :+ BucketCol
    val right = offsets.select(keys.zipWithIndex.map { case (k, i) =>
      col(k).as(s"__qo$i") } :+ col("__boffset"): _*)
    val cond = keys.zipWithIndex
      .map { case (k, i) => bucketed(k) <=> right(s"__qo$i") }
      .reduce(_ && _)
    bucketed.join(broadcast(right), cond)
      .drop(keys.indices.map(i => s"__qo$i"): _*)
  }
}
