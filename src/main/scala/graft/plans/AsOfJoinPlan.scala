package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join — a whole-operator Catalyst extension (logical node
  * + strategy + physical exec), the brief's option (c) for semantics the
  * built-in operators can't express efficiently.
  *
  * The composed formulation ([[graft.ops.TemporalJoins.asOfJoin]]) pads
  * the right side to the left schema, unions, and runs an
  * unbounded-preceding window — correct, one shuffle, but every right
  * row is widened to the union schema and the window operator buffers
  * rows per key. This operator instead asks Catalyst for the two sides
  * hash-clustered on the key and sorted (key, ts) / (key, ts, id), then
  * streams BOTH sorted iterators through a single merge with O(1) state
  * per partition: the latest right (id, ts) at or before the current
  * left row. No union row padding, no window buffer, each side shuffles
  * only itself — the shape that holds when both sides are 100 TB.
  *
  * Semantics (pinned by the DuckDB `ASOF LEFT JOIN` oracle and the
  * differential spec against the composed twin):
  *   - per left row: the right row with the greatest rightTs <= leftTs
  *     for the same key, LEFT semantics (no match -> nulls);
  *   - ties on (key, ts) resolve to the highest id — the merge consumes
  *     equal-ts right rows in id order, so the last one wins, which is
  *     exactly the composed version's dedupe-keep-max-id;
  *   - null keys/timestamps never match (SQL join semantics; the window
  *     formulation needs an explicit dedupe + they sort first here and
  *     are discarded).
  *
  * The operator itself is brief-driven (the reference framework has no
  * temporal-join surface); semantics follow the standard ASOF JOIN
  * definition the DuckDB oracle implements.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightId: Attribute,
    matchedId: AttributeReference, matchedTs: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ matchedId :+ matchedTs
  override def producedAttributes: AttributeSet = AttributeSet(Seq(matchedId, matchedTs))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; injected via
  * [[graft.GraftExtensions]]. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.leftTs, n.rightKey, n.rightTs, n.rightId,
        n.matchedId, n.matchedTs, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightId: Attribute,
    matchedId: AttributeReference, matchedTs: AttributeReference,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output :+ matchedId :+ matchedTs
  override def producedAttributes: AttributeSet = AttributeSet(Seq(matchedId, matchedTs))

  /** Hash-cluster both sides on the key (co-partitioned, like
    * sort-merge join children). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Sorted merge order; the id tie-break on the right makes equal-ts
    * winners deterministic without a dedupe pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightId, Ascending)) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    // Bind to locals: the closure must not capture the SparkPlan.
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    val rIdOrd = right.output.indexWhere(_.exprId == rightId.exprId)
    require(Seq(lKeyOrd, lTsOrd, rKeyOrd, rTsOrd, rIdOrd).forall(_ >= 0),
      "as-of join columns must be present in child outputs")
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val idType = rightId.dataType
    val outAttrs = output
    val keyCmp = TypeUtils.getInterpretedOrdering(keyType)
    val tsCmp = TypeUtils.getInterpretedOrdering(tsType)

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val matchRow = new GenericInternalRow(2)

        new Iterator[InternalRow] {
          // Retained values, never retained rows: child iterators reuse
          // their row buffers, so key/ts/id are extracted immediately
          // (UTF8String cloned off the buffer).
          private def copyVal(v: Any): Any = v match {
            case s: UTF8String => s.clone()
            case other => other
          }
          private var pK: Any = _; private var pT: Any = _; private var pI: Any = _
          private var hasPending = false
          private var mK: Any = _; private var mT: Any = _; private var mI: Any = _
          private var hasMatch = false

          /** Consume right rows until the first one beyond (lk, lt),
            * recording the latest at-or-before candidate. O(total right)
            * across the whole partition. */
          private def advanceRight(lk: Any, lt: Any): Unit = {
            var done = false
            while (!done) {
              if (!hasPending) {
                if (!rIter.hasNext) return
                val r = rIter.next()
                if (!r.isNullAt(rKeyOrd) && !r.isNullAt(rTsOrd)) {
                  pK = copyVal(r.get(rKeyOrd, keyType))
                  pT = copyVal(r.get(rTsOrd, tsType))
                  pI = if (r.isNullAt(rIdOrd)) null else copyVal(r.get(rIdOrd, idType))
                  hasPending = true
                }
              }
              if (hasPending) {
                val c = keyCmp.compare(pK, lk)
                if (c < 0) hasPending = false // key already passed by left
                else if (c == 0 && tsCmp.compare(pT, lt) <= 0) {
                  mK = pK; mT = pT; mI = pI; hasMatch = true
                  hasPending = false
                } else done = true
              }
            }
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            var found = false
            if (!l.isNullAt(lKeyOrd) && !l.isNullAt(lTsOrd)) {
              val lk = l.get(lKeyOrd, keyType)
              val lt = l.get(lTsOrd, tsType)
              advanceRight(lk, lt)
              found = hasMatch && keyCmp.compare(mK, lk) == 0
            }
            if (found) {
              matchRow.update(0, mI); matchRow.update(1, mT)
              numMatchedRows += 1
            }
            else { matchRow.update(0, null); matchRow.update(1, null) }
            numOutputRows += 1
            proj(joined(l, matchRow))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // ------------------------------------------------------------- codegen
  // Whole-stage codegen of the merge loop, the SortMergeJoinExec pattern:
  // both sorted children arrive as input RDDs (WholeStageCodegenExec
  // zip-partitions exactly two), the O(1) merge state lives in mutable
  // fields of the generated class, and the loop compiles into the same
  // stage as the downstream project/filter — no interpreted row-at-a-time
  // hop between codegen'd stages (the round-2 gap this closes).
  // `doExecute` above remains the interpreted fallback (codegen off,
  // or key/ts/id types outside the supported set); the differential spec
  // pins both paths to identical output.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  private def codegenOk(t: DataType): Boolean =
    CodeGenerator.isPrimitiveType(t) || t == StringType || t == BinaryType

  override def supportCodegen: Boolean =
    Seq(leftKey.dataType, leftTs.dataType, rightId.dataType).forall(codegenOk)

  /** Clone values lifted out of reused row buffers into merge state
    * (same contract as `copyVal` in the interpreted path). */
  private def copyCode(t: DataType, v: String): String = t match {
    case StringType => s"$v.clone()"
    case BinaryType => s"(byte[]) $v.clone()"
    case _ => v
  }

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")

    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    val rIdOrd = right.output.indexWhere(_.exprId == rightId.exprId)
    require(Seq(lKeyOrd, lTsOrd, rKeyOrd, rTsOrd, rIdOrd).forall(_ >= 0),
      "as-of join columns must be present in child outputs")
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val idType = rightId.dataType
    val keyJ = CodeGenerator.javaType(keyType)
    val tsJ = CodeGenerator.javaType(tsType)
    val idJ = CodeGenerator.javaType(idType)

    // O(1)-per-partition merge state: the pending (not yet consumed)
    // right row's values and the best at-or-before match so far.
    val hasPending = ctx.addMutableState("boolean", "asofHasPending")
    val pK = ctx.addMutableState(keyJ, "asofPK")
    val pT = ctx.addMutableState(tsJ, "asofPT")
    val pI = ctx.addMutableState(idJ, "asofPI")
    val pINull = ctx.addMutableState("boolean", "asofPINull")
    val hasMatch = ctx.addMutableState("boolean", "asofHasMatch")
    val mK = ctx.addMutableState(keyJ, "asofMK")
    val mT = ctx.addMutableState(tsJ, "asofMT")
    val mI = ctx.addMutableState(idJ, "asofMI")
    val mINull = ctx.addMutableState("boolean", "asofMINull")

    val numOutput = metricTerm(ctx, "numOutputRows")
    val numMatched = metricTerm(ctx, "numMatchedRows")

    val leftRow = ctx.freshName("asofLeftRow")
    val rightRow = ctx.freshName("asofRightRow")
    val lk = ctx.freshName("asofLk")
    val lt = ctx.freshName("asofLt")
    val found = ctx.freshName("asofFound")
    val done = ctx.freshName("asofDone")
    val cmp = ctx.freshName("asofCmp")

    // Left columns flow to consume() straight off the left row.
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val outIdNull = ctx.freshName("asofOutIdNull")
    val outId = ctx.freshName("asofOutId")
    val outTsNull = ctx.freshName("asofOutTsNull")
    val outTs = ctx.freshName("asofOutTs")
    val idEv = ExprCode(code"",
      JavaCode.isNullVariable(outIdNull), JavaCode.variable(outId, idType))
    val tsEv = ExprCode(code"",
      JavaCode.isNullVariable(outTsNull), JavaCode.variable(outTs, tsType))

    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  boolean $found = false;
       |  if (!$leftRow.isNullAt($lKeyOrd) && !$leftRow.isNullAt($lTsOrd)) {
       |    $keyJ $lk = ${CodeGenerator.getValue(leftRow, keyType, lKeyOrd.toString)};
       |    $tsJ $lt = ${CodeGenerator.getValue(leftRow, tsType, lTsOrd.toString)};
       |    // consume right rows until the first one beyond (lk, lt),
       |    // recording the latest at-or-before candidate
       |    boolean $done = false;
       |    while (!$done) {
       |      if (!$hasPending) {
       |        if (!$rightInput.hasNext()) break;
       |        InternalRow $rightRow = (InternalRow) $rightInput.next();
       |        if (!$rightRow.isNullAt($rKeyOrd) && !$rightRow.isNullAt($rTsOrd)) {
       |          $pK = ${copyCode(keyType, CodeGenerator.getValue(rightRow, keyType, rKeyOrd.toString))};
       |          $pT = ${copyCode(tsType, CodeGenerator.getValue(rightRow, tsType, rTsOrd.toString))};
       |          $pINull = $rightRow.isNullAt($rIdOrd);
       |          $pI = $pINull ? ${CodeGenerator.defaultValue(idType)}
       |            : ${copyCode(idType, CodeGenerator.getValue(rightRow, idType, rIdOrd.toString))};
       |          $hasPending = true;
       |        }
       |      }
       |      if ($hasPending) {
       |        int $cmp = ${ctx.genComp(keyType, pK, lk)};
       |        if ($cmp < 0) { $hasPending = false; }
       |        else if ($cmp == 0 && ${ctx.genComp(tsType, pT, lt)} <= 0) {
       |          $mK = $pK; $mT = $pT; $mI = $pI; $mINull = $pINull;
       |          $hasMatch = true; $hasPending = false;
       |        } else { $done = true; }
       |      }
       |    }
       |    $found = $hasMatch && ${ctx.genComp(keyType, mK, lk)} == 0;
       |  }
       |  boolean $outIdNull = true;
       |  $idJ $outId = ${CodeGenerator.defaultValue(idType)};
       |  boolean $outTsNull = true;
       |  $tsJ $outTs = ${CodeGenerator.defaultValue(tsType)};
       |  if ($found) {
       |    $numMatched.add(1);
       |    $outIdNull = $mINull; $outId = $mI;
       |    $outTsNull = false; $outTs = $mT;
       |  }
       |  $numOutput.add(1);
       |  ${evaluateVariables(leftVars)}
       |  ${consume(ctx, leftVars ++ Seq(idEv, tsEv))}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}
