package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** COLUMN-LEVEL LINEAGE extraction from the analyzed Catalyst plan —
  * the warehouse governance feature ("which physical columns feed this
  * output?") computed from the engine's own metadata rather than
  * regexing SQL text: walk the logical plan bottom-up accumulating,
  * per attribute ExprId, the set of base-relation columns it
  * transitively depends on. Aliases in Project/Aggregate/Window fold
  * their references' sources; every other operator passes its
  * children's mappings through; leaf parquet relations seed
  * `table.column` from the scan's root path.
  *
  * Driver-side plan walking only — the plan is O(operators), never
  * data; the result is the impact-analysis table a catalog ingests.
  */
object Lineage {

  private def tableName(lr: LogicalRelation): String = {
    val path = lr.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(_.getName).getOrElse("unknown")
      case _ => "unknown"
    }
    path.stripSuffix(".parquet")
  }

  /** Map each output attribute of `df` to its sorted base columns. */
  def columnLineage(df: DataFrame): Seq[(String, Seq[String])] = {
    val plan = df.queryExecution.analyzed

    def walk(p: LogicalPlan): Map[ExprId, Set[String]] = {
      val fromChildren: Map[ExprId, Set[String]] =
        p.children.map(walk).foldLeft(Map.empty[ExprId, Set[String]]) {
          (a, b) => a ++ b
        }
      def srcOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Set[String] =
        e.references.iterator
          .flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty[String]))
          .toSet
      p match {
        case lr: LogicalRelation =>
          val t = tableName(lr)
          lr.output.map(a => a.exprId -> Set(s"$t.${a.name}")).toMap
        case pr: Project =>
          fromChildren ++ aliasSources(pr.projectList, srcOf)
        case ag: Aggregate =>
          fromChildren ++ aliasSources(ag.aggregateExpressions, srcOf)
        case w: Window =>
          fromChildren ++ aliasSources(w.windowExpressions, srcOf)
        case _ => fromChildren
      }
    }

    def aliasSources(
        list: Seq[NamedExpression],
        srcOf: org.apache.spark.sql.catalyst.expressions.Expression => Set[String])
        : Map[ExprId, Set[String]] =
      list.collect {
        case a: Alias => a.exprId -> srcOf(a.child)
      }.toMap

    val m = walk(plan)
    plan.output.map { a: Attribute =>
      a.name -> m.getOrElse(a.exprId, Set.empty[String]).toSeq.sorted
    }
  }

  /** The lineage as a DataFrame (query label attached) — the shape a
    * governance catalog ingests. */
  def lineageDf(spark: SparkSession, queryName: String, df: DataFrame)
      : DataFrame = {
    import spark.implicits._
    columnLineage(df)
      .map { case (c, srcs) => (queryName, c, srcs.mkString(",")) }
      .toDF("query_name", "out_col", "source_cols")
  }
}
