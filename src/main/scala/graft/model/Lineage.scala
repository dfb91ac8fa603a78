package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Aggregate}
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

  def of(df: DataFrame): Seq[ColumnLineage] = {
    val plan = df.queryExecution.analyzed
    // Map each attribute id to the base relation columns it descends from.
    val baseOf = scala.collection.mutable.Map.empty[Long, Set[String]]

    def relationName(p: LogicalPlan): String = p match {
      case lr: LogicalRelation =>
        lr.catalogTable.map(_.identifier.table).getOrElse(
          lr.relation.toString.takeWhile(_ != '('))
      case other => other.nodeName
    }

    // Bottom-up: seed leaves, then propagate through named expressions.
    plan.foreachUp {
      case leaf if leaf.children.isEmpty =>
        val rel = relationName(leaf)
        leaf.output.foreach(a => baseOf(a.exprId.id) = Set(s"$rel.${a.name}"))
      case p: Project =>
        p.projectList.foreach(ne => baseOf(ne.exprId.id) = refsOf(ne, baseOf))
      case a: Aggregate =>
        a.aggregateExpressions.foreach(ne => baseOf(ne.exprId.id) = refsOf(ne, baseOf))
      case other =>
        other.output.foreach { a =>
          if (!baseOf.contains(a.exprId.id))
            baseOf(a.exprId.id) = other.children.flatMap(
              _.output.filter(_.exprId == a.exprId)
                .flatMap(x => baseOf.getOrElse(x.exprId.id, Set.empty))).toSet
        }
    }

    plan.output.map { a =>
      ColumnLineage(a.name, baseOf.getOrElse(a.exprId.id, Set.empty),
        transformsOf(plan, a))
    }
  }

  private def refsOf(
      ne: NamedExpression,
      baseOf: collection.Map[Long, Set[String]]): Set[String] =
    ne.references.iterator.flatMap(r => baseOf.getOrElse(r.exprId.id, Set.empty)).toSet

  private def transformsOf(plan: LogicalPlan, attr: Attribute): Set[String] = {
    val found = scala.collection.mutable.Set.empty[String]
    plan.foreach {
      case p: Project =>
        p.projectList.filter(_.exprId == attr.exprId).foreach(collectFns(_, found))
      case a: Aggregate =>
        a.aggregateExpressions.filter(_.exprId == attr.exprId).foreach(collectFns(_, found))
      case _ =>
    }
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
