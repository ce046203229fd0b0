package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MATERIALIZED-VIEW rewrite rule — the classic summary-table
  * optimization (Goldstein & Larson SIGMOD'01 "Optimizing queries
  * using materialized views"): an aggregate over the raw fact scan
  * whose grouping is a SUBSET of a registered summary's dimensions
  * and whose measures are derivable from the summary's partial
  * aggregates is answered by RE-AGGREGATING the summary instead of
  * scanning the fact table. At 100 TB this is the difference between
  * a full fact scan and a metadata-sized read — the standing reason
  * warehouses maintain rollup tables, expressed as a Catalyst
  * `Rule[LogicalPlan]` (injectable via extraOptimizations /
  * SparkSessionExtensions, like [[CollapseNfcNormalize]]).
  *
  * Correct by algebra: SUM is re-aggregable (Σ of partial Σs) and
  * COUNT(*) re-aggregates as Σ of partial counts — the rewrite is
  * value-identical for any grouping subset, which is exactly what
  * q224's oracle (the same SQL over the RAW fact table) certifies.
  * Exactness note: double SUM re-aggregation changes summation order,
  * so the rule is registered only for measures whose sums are
  * order-exact (integral doubles ≤ 2⁵³ here; production would pin
  * decimals).
  *
  * Scope (deliberately narrow — a real MV matcher grows from here):
  * matches `Aggregate(groupings ⊆ dims, aggs ∈ {dim passthrough,
  * SUM(measure), COUNT(*)/COUNT(1)})` directly over (a column-pruning
  * Project of) the fact scan, identified by a path token. Output
  * attribute ids are preserved by re-aliasing onto the original
  * exprIds, so the rewritten subtree drops in without disturbing the
  * enclosing plan.
  *
  * @param factPathToken substring identifying the fact table's file
  *                      location (e.g. "lineitem.parquet")
  * @param dims          summary dimension column names
  * @param sumMap        fact measure column -> summary partial-sum column
  * @param cntCol        summary partial-count column name
  * @param summary       resolved logical plan of the summary table scan
  */
case class SummaryRewrite(factPathToken: String, dims: Set[String],
                          sumMap: Map[String, String], cntCol: String,
                          summary: LogicalPlan) extends Rule[LogicalPlan] {

  private def isFactScan(p: LogicalPlan): Boolean = p match {
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.exists(_.toString.contains(factPathToken))
      case _ => false
    }
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      isFactScan(child)
    case _ => false
  }

  private def sAttr(name: String): Attribute =
    summary.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"summary lacks column $name"))

  private def rewritable(e: NamedExpression): Boolean = e match {
    case a: AttributeReference => dims(a.name)
    case Alias(AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _), _) =>
      sumMap.contains(a.name)
    case Alias(AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _), _) =>
      true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Aggregate(groupings, aggExprs, child, hint) if isFactScan(child) &&
        groupings.forall {
          case a: AttributeReference => dims(a.name); case _ => false } &&
        aggExprs.forall(rewritable) =>
      val newAggs: Seq[NamedExpression] = aggExprs.map {
        case a: AttributeReference =>
          Alias(sAttr(a.name), a.name)(exprId = a.exprId)
        case al @ Alias(AggregateExpression(Sum(a: AttributeReference, _), _, _, _, _), name) =>
          Alias(Sum(sAttr(sumMap(a.name))).toAggregateExpression(), name)(
            exprId = al.exprId)
        case al @ Alias(AggregateExpression(Count(_), _, _, _, _), name) =>
          Alias(Sum(sAttr(cntCol)).toAggregateExpression(), name)(
            exprId = al.exprId)
      }
      val newGroupings = groupings.map {
        case a: AttributeReference => sAttr(a.name)
      }
      Aggregate(newGroupings, newAggs, summary, hint)
  }
}
