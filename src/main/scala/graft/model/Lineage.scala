package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level lineage extracted from Catalyst's analyzed logical plan —
  * the Spark re-expression of the reference's sqlglot-AST lineage
  * (src/framework/parser.py:380-470, utils/lineage.py). Because we walk
  * the *resolved* plan rather than raw SQL text, lineage survives
  * aliasing, subqueries, and view expansion for free.
  */
object Lineage {

  final case class ColumnLineage(
      column: String,
      sources: Set[String], // "relation.column"
      transformations: Set[String])

  def of(df: DataFrame): Seq[ColumnLineage] = ofPlan(df.queryExecution.analyzed, Map.empty)

  /** Like [[of]], but attribution STOPS at model boundaries: a
    * `SubqueryAlias` whose name is a key of `modelRelations` (lowercased
    * relation name → model name) is treated as a leaf, and its columns
    * read `model.column`. This yields each model's IMMEDIATE column
    * sources, the edges [[ProjectLineage]] chains into the cross-model
    * column graph (reference: utils/lineage.py ColumnLineage
    * source_columns, dependency.py:332 get_column_lineage). */
  def ofModel(df: DataFrame, modelRelations: Map[String, String]): Seq[ColumnLineage] =
    ofPlan(df.queryExecution.analyzed, modelRelations)

  private def ofPlan(
      plan: LogicalPlan,
      modelRelations: Map[String, String]): Seq[ColumnLineage] = {
    // Map each attribute id to the base relation columns it descends from.
    val baseOf = scala.collection.mutable.Map.empty[Long, Set[String]]

    def relationName(p: LogicalPlan): String = p match {
      case lr: LogicalRelation =>
        lr.catalogTable.map(_.identifier.table).getOrElse(
          lr.relation.toString.takeWhile(_ != '('))
      case other => other.nodeName
    }

    def boundary(p: LogicalPlan): Option[String] = p match {
      case sa: SubqueryAlias => modelRelations.get(sa.alias.toLowerCase)
      case _ => None
    }

    // Bottom-up: seed leaves (and model boundaries), then propagate
    // through named expressions.
    def walk(p: LogicalPlan): Unit = boundary(p) match {
      case Some(model) =>
        p.output.foreach(a => baseOf(a.exprId.id) = Set(s"$model.${a.name}"))
      case None =>
        p.children.foreach(walk)
        p match {
          case leaf if leaf.children.isEmpty =>
            val rel = relationName(leaf)
            leaf.output.foreach(a => baseOf(a.exprId.id) = Set(s"$rel.${a.name}"))
          case pr: Project =>
            pr.projectList.foreach(ne => baseOf(ne.exprId.id) = refsOf(ne, baseOf))
          case ag: Aggregate =>
            ag.aggregateExpressions.foreach(ne => baseOf(ne.exprId.id) = refsOf(ne, baseOf))
          case other =>
            other.output.foreach { a =>
              if (!baseOf.contains(a.exprId.id))
                baseOf(a.exprId.id) = other.children.flatMap(
                  _.output.filter(_.exprId == a.exprId)
                    .flatMap(x => baseOf.getOrElse(x.exprId.id, Set.empty))).toSet
            }
        }
    }
    walk(plan)

    plan.output.map { a =>
      ColumnLineage(a.name, baseOf.getOrElse(a.exprId.id, Set.empty),
        transformsOf(plan, a, p => boundary(p).isDefined))
    }
  }

  private def refsOf(
      ne: NamedExpression,
      baseOf: collection.Map[Long, Set[String]]): Set[String] =
    ne.references.iterator.flatMap(r => baseOf.getOrElse(r.exprId.id, Set.empty)).toSet

  private def transformsOf(
      plan: LogicalPlan, attr: Attribute,
      stop: LogicalPlan => Boolean): Set[String] = {
    val found = scala.collection.mutable.Set.empty[String]
    def walk(p: LogicalPlan): Unit = if (!stop(p)) {
      p match {
        case pr: Project =>
          pr.projectList.filter(_.exprId == attr.exprId).foreach(collectFns(_, found))
        case ag: Aggregate =>
          ag.aggregateExpressions.filter(_.exprId == attr.exprId).foreach(collectFns(_, found))
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(plan)
    found.toSet
  }

  private def collectFns(e: Expression, out: scala.collection.mutable.Set[String]): Unit = {
    e.foreach {
      case _: Attribute => ()
      case other if other.children.nonEmpty || other.prettyName != "alias" =>
        if (other.prettyName != "alias") out += other.prettyName
      case _ => ()
    }
  }
}
