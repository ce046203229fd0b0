package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[graft.plans.SummaryRewrite]] — the materialized-view rule must
  * (a) answer a coarser-grouping aggregate FROM THE SUMMARY (plan
  * assert: the scan reads the rollup parquet, not the fact table),
  * (b) return values identical to the un-rewritten plan, and
  * (c) leave non-derivable aggregates untouched. */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("coarser rollup is answered from the summary, value-identical") {
    val s2 = spark.newSession() // isolate the rule registration
    val rule = graft.queries.Relational.lineitemMvRule(s2, TestSession.sf)
    val raw = graft.io.Tables.lineitem(s2, TestSession.sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    val want = raw.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    org.apache.spark.sql.graftbridge.Bridge.addOptimization(s2, rule)
    val rewritten = graft.io.Tables.lineitem(s2, TestSession.sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("lineitem_rollup"),
      s"expected the summary scan in the plan:\n$plan")
    assert(!plan.contains("lineitem.parquet"),
      s"fact scan should be gone:\n$plan")
    val got = rewritten.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == want)
  }

  test("non-derivable aggregates are NOT rewritten") {
    val s2 = spark.newSession()
    org.apache.spark.sql.graftbridge.Bridge.addOptimization(s2,
      graft.queries.Relational.lineitemMvRule(s2, TestSession.sf))
    // max() is not derivable from a SUM/COUNT summary
    val q = graft.io.Tables.lineitem(s2, TestSession.sf)
      .groupBy(col("l_returnflag"))
      .agg(max(col("l_quantity")).as("mx"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("lineitem.parquet"),
      s"must still scan the fact table:\n$plan")
    // grouping outside the summary dims must also pass through
    val q2 = graft.io.Tables.lineitem(s2, TestSession.sf)
      .groupBy(col("l_shipdate"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
    assert(q2.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
  }
}
