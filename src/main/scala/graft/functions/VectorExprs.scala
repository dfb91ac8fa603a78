package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding arithmetic (dot product,
  * L2 norm, cosine). These replace the higher-order-function
  * formulations (`aggregate(zip_with(...))`) in [[graft.ops.Similarity]]:
  * Spark's HOFs are CodegenFallback — every pair evaluation interprets a
  * lambda and boxes each element — while these compile to a tight
  * primitive loop inlined into whole-stage codegen. The ANN hot path
  * (N×Q brute-force scoring, LSH plane projections, IVF cell assignment)
  * is exactly this arithmetic.
  *
  * Accumulation is the same sequential left-to-right fold as the
  * composed versions (and the DuckDB oracle SQL), element casts happen
  * per element before multiply — results are bit-identical, which the
  * oracle hash-compares pin. Null/length semantics also mirror
  * `zip_with` + `aggregate`: mismatched lengths or a null element yield
  * NULL (zip_with pads with null; null poisons the sum).
  *
  * Brief-driven (the similarity stack has no reference-framework
  * counterpart); the DuckDB oracles pin the arithmetic.
  */
object VectorExprs {
  import org.apache.spark.sql.functions.call_function

  /** Dot product of two array<float|double> columns → double. */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** L2 norm of an array<float|double> column → double. */
  def vecNorm(a: Column): Column = call_function("vec_norm", a)

  /** Cosine similarity of two array<float|double> columns → double. */
  def vecCosine(a: Column, b: Column): Column =
    call_function("vec_cosine", a, b)
}

/** Loop kernels, callable from generated code. The boolean flags select
  * the element accessor (float vs double) per side, resolved at plan
  * time — inside the loop there is no type dispatch. Boxed Double return
  * carries the NULL result (mismatched lengths / null element). */
object VectorImpl {

  def dot(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def norm(a: ArrayData, aFloat: Boolean): java.lang.Double = {
    val d = dot(a, a, aFloat, aFloat)
    if (d == null) null else java.lang.Math.sqrt(d.doubleValue())
  }

  /** One fused pass accumulating dot, |a|², |b|² — each accumulator sees
    * the identical operation sequence as its standalone fold, so
    * `cosine == dot/(norm*norm)` bit-for-bit. A zero-norm side (all-zero
    * or empty vector) returns NULL, matching Spark Divide's null-on-zero
    * semantics — raw JVM division would yield NaN, which Spark orders
    * above every double and would leak through `> threshold` filters. */
  def cosine(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) return null
    acc / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }
}

private[functions] trait VecTypeCheck { self: Expression =>
  protected def elemIsFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected def checkVec(t: DataType, side: String): TypeCheckResult = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName $side argument must be array<float> or array<double>, got $other")
  }
}

case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with VecTypeCheck {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(checkVec(left.dataType, "left"), checkVec(right.dataType, "right"))
      .find(!_.isSuccess).getOrElse(TypeCheckResult.TypeCheckSuccess)

  private def aF = elemIsFloat(left.dataType)
  private def bF = elemIsFloat(right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecDot")
      s"""java.lang.Double $tmp = graft.functions.VectorImpl.dot($a, $b, $aF, $bF);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

case class VecNormExpr(child: Expression)
    extends UnaryExpression with VecTypeCheck {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm"

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "input")

  private def aF = elemIsFloat(child.dataType)

  protected override def nullSafeEval(a: Any): Any =
    VectorImpl.norm(a.asInstanceOf[ArrayData], aF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("vecNorm")
      s"""java.lang.Double $tmp = graft.functions.VectorImpl.norm($a, $aF);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNormExpr =
    copy(child = newChild)
}

case class VecCosineExpr(left: Expression, right: Expression)
    extends BinaryExpression with VecTypeCheck {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(checkVec(left.dataType, "left"), checkVec(right.dataType, "right"))
      .find(!_.isSuccess).getOrElse(TypeCheckResult.TypeCheckSuccess)

  private def aF = elemIsFloat(left.dataType)
  private def bF = elemIsFloat(right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecCos")
      s"""java.lang.Double $tmp = graft.functions.VectorImpl.cosine($a, $b, $aF, $bF);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosineExpr =
    copy(left = newLeft, right = newRight)
}
