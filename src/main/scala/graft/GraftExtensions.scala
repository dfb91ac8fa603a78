package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{BloomBuildAgg, MinHashSigExpr, SimHash60Expr, TopKByScore, VecCosineExpr, VecDotExpr, VecNormExpr}

/** Session extensions registering graft's native Catalyst expressions as
  * SQL functions (usable from `spark.sql` text and via
  * `functions.call_function`). Wired by
  * `spark.sql.extensions=graft.GraftExtensions` — included in
  * [[Tables.sessionConfigs]] so every graft session has them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator extension: native as-of join (logical node planned
    // to a sorted streaming merge; see graft.plans.AsOfJoinPlan).
    ext.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)

    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60Expr].getName, "simhash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash60(tokens) takes one argument")
        SimHash60Expr(args.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "minhash_sig(shingles, numHashes) takes two arguments")
        val n = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig numHashes must be an integer literal, got $other")
        }
        MinHashSigExpr(args.head, n)
      }))

    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes two arguments")
        VecDotExpr(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNormExpr].getName, "vec_norm"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_norm(a) takes one argument")
        VecNormExpr(args.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosineExpr].getName, "vec_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_cosine(a, b) takes two arguments")
        VecCosineExpr(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "topk_by_score(score, id, k) takes three arguments")
        val k = args(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_by_score k must be an integer literal, got $other")
        }
        TopKByScore(args(0), args(1), k).toAggregateExpression()
      }))

    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomBuildAgg].getName, "bloom_build"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "bloom_build(key, numBits, numHashes) takes three arguments")
        val lits = args.tail.map {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"bloom_build numBits/numHashes must be integer literals, got $other")
        }
        BloomBuildAgg(args.head, lits(0), lits(1)).toAggregateExpression()
      }))
  }
}
