package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for, composed from
  * operators it does have (the brief's preference order: compose before
  * custom plans).
  *
  * - [[asOfJoin]]: for each left row, the most recent right row with
  *   rightTs <= leftTs per key. Implemented as union → single window
  *   pass: one shuffle on (key), no range cross-product, no per-key
  *   driver loops — the formulation that holds at 100 TB (both sides
  *   stream through one sort-merge window).
  * - [[rangeJoinBucketed]]: right rows within [leftTs - lookback,
  *   leftTs] per key. Each right row lands in exactly one time bucket;
  *   each left row probes its bucket and the previous one, so the join
  *   is equi-keyed on (key, bucket) — shuffle-friendly — and the exact
  *   range predicate filters the at-most-2× candidates.
  */
object TemporalJoins {

  /** As-of (backward) join.
    *
    * Right rows are deduplicated per (key, ts) keeping the highest
    * tie-break id so the match is deterministic (and mirrors a
    * dedupe-then-ASOF oracle). Output: all left columns plus the matched
    * right id/ts (null when no earlier right row exists — LEFT
    * semantics).
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      rightPrefix: String = "matched"): DataFrame = {

    // Deterministic right side: one row per (key, ts).
    val w = Window.partitionBy(col(keyCol), col(tsCol)).orderBy(col(idCol).desc)
    val rightDeduped = right
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")

    val leftTagged = left
      .withColumn("__is_left", lit(1))
      .withColumn("__rid", lit(null).cast("long"))
      .withColumn("__rts", lit(null).cast(left.schema(tsCol).dataType))
    val rightTagged = rightDeduped
      .select(col(keyCol), col(tsCol), col(idCol))
      .withColumn("__is_left", lit(0))
      .withColumn("__rid", col(idCol))
      .withColumn("__rts", col(tsCol))
    // Common-schema union: right contributes only key/ts/id plus markers.
    val rightAligned = leftTagged.columns.foldLeft(rightTagged) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(leftTagged.columns.map(col): _*)

    // At equal ts the right row sorts first (__is_left asc), so a match
    // at exactly leftTs is visible to the left row — ASOF `>=` semantics.
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__is_left"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftTagged.unionByName(rightAligned)
      .withColumn(s"${rightPrefix}_$idCol", last(col("__rid"), ignoreNulls = true).over(ordered))
      .withColumn(s"${rightPrefix}_$tsCol", last(col("__rts"), ignoreNulls = true).over(ordered))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__rid", "__rts")
  }

  /** As-of join through the native operator
    * ([[graft.plans.AsOfJoinNode]] → AsOfJoinExec): same semantics and
    * output schema as [[asOfJoin]] (differentially tested), but executed
    * as a sorted streaming merge of the two hash-clustered sides —
    * no union row padding, no window buffering, O(1) state per
    * partition. The right side is pre-projected to (key, ts, id) so the
    * shuffle moves three columns regardless of its width. */
  def asOfJoinNative(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      rightPrefix: String = "matched"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val lp = left.queryExecution.analyzed
    // Alias-project the right side: the aliases mint fresh exprIds that
    // survive the analyzer's self-join relation dedup (which rewrites
    // relation outputs inside the subtree but cannot remap a custom
    // node's attribute fields), so left/right columns stay unambiguous
    // even when both sides scan the same table.
    val rp = right.select(col(keyCol).as("__asof_key"),
      col(tsCol).as("__asof_ts"), col(idCol).as("__asof_id"))
      .queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column '$n' not found"))
    val rightId = attr(rp, "__asof_id")
    val rightTs = attr(rp, "__asof_ts")
    val node = graft.plans.AsOfJoinNode(
      lp, rp,
      attr(lp, keyCol), attr(lp, tsCol),
      attr(rp, "__asof_key"), rightTs, rightId,
      AttributeReference(s"${rightPrefix}_$idCol", rightId.dataType, nullable = true)(),
      AttributeReference(s"${rightPrefix}_$tsCol", rightTs.dataType, nullable = true)())
    org.apache.spark.sql.graftext.Bridge.ofRows(left.sparkSession, node)
  }

  /** As-of join with a bounded lookback (pandas merge_asof `tolerance`):
    * the matched right row must lie within `toleranceUs` microseconds
    * before the left timestamp, else the row stays unmatched. Because
    * the as-of match is already the LATEST right row at-or-before the
    * left one, a post-filter is exactly equivalent to constraining the
    * search — no older candidate could have qualified. */
  def asOfJoinTolerance(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      toleranceUs: Long,
      rightPrefix: String = "matched"): DataFrame = {
    require(toleranceUs >= 0, "tolerance must be non-negative")
    val mId = s"${rightPrefix}_$idCol"
    val mTs = s"${rightPrefix}_$tsCol"
    val within = unix_micros(col(mTs)) >= unix_micros(col(tsCol)) - toleranceUs
    asOfJoinNative(left, right, keyCol, tsCol, idCol, rightPrefix)
      .withColumn(mId, when(within, col(mId)))
      .withColumn(mTs, when(within, col(mTs)))
  }

  /** Keyed range join: pairs (left, right) with same key and
    * rightTs in [leftTs - lookbackUs, leftTs] (timestamps as epoch-micros
    * long columns). `bucketUs` defaults to the lookback, giving the
    * at-most-2-probe property. */
  def rangeJoinBucketed(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsUs: String, rightTsUs: String,
      lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, "lookback must be positive")
    val b = lit(lookbackUs)
    val rightB = right.withColumn("__bucket", floor(col(rightTsUs) / b))
    val leftB = left.withColumn("__bucket",
      explode(array(floor(col(leftTsUs) / b), floor(col(leftTsUs) / b) - 1)))
    leftB.join(rightB, Seq(keyCol, "__bucket"))
      .filter(col(rightTsUs) >= col(leftTsUs) - b && col(rightTsUs) <= col(leftTsUs))
      .drop("__bucket")
  }
}
