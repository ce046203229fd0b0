package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a WHOLE-OPERATOR Catalyst extension — the full
  * custom-operator stack (logical node → planner strategy → physical
  * exec), complementing the declarative union+window formulation in
  * [[graft.ops.AsOfJoin.asOf]]. Semantics are identical (q63 is
  * hash-checked against the same DuckDB ASOF JOIN oracle as q59);
  * what this buys is a streaming per-partition MERGE:
  *
  *  - the exec declares `ClusteredDistribution` on the key columns
  *    for both children and an ascending (keys, ts) sort — Spark's
  *    EnsureRequirements inserts the exchanges and sorts, exactly as
  *    it does for SortMergeJoin;
  *  - per partition, one forward pass over both sorted sides with a
  *    single carried right row — no per-key buffering of BOTH sides
  *    in a window buffer, no union row inflation; memory is O(1)
  *    beyond the sorts.
  *
  * Null timestamps never match (left null-ts rows emit null payload;
  * right null-ts rows are skipped).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    payload: Seq[Expression], payloadOut: Seq[Attribute],
    inclusive: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  // the payload columns are born here, not derived from the children
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. Register per session
  * via `Bridge.addStrategy` or `SparkSessionExtensions
  * .injectPlannerStrategy` ([[graft.functions.GraftExtensions]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.payload, p.payloadOut, p.inclusive,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children arrive hash-clustered on the keys
  * and sorted by (keys, ts); one forward merge pass per partition. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    payload: Seq[Expression], payloadOut: Seq[Attribute],
    inclusive: Boolean, left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  // one output row per left row, partitioned as the left side is
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // left rows keep their arrival order (keys, ts)
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val incl = inclusive
    val lOut = left.output
    val rOut = right.output
    val lKeysL = leftKeys; val rKeysL = rightKeys
    val lTsL = leftTs; val rTsL = rightTs
    val payL = payload
    val outAttrs = output
    val nPay = payloadOut.size

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeysL, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysL, rOut)
      val payProj = UnsafeProjection.create(payL, rOut)
      val lTsEval = BindReferences.bindReference(lTsL, lOut)
      val rTsEval = BindReferences.bindReference(rTsL, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPay = new GenericInternalRow(nPay)
      val joined = new JoinedRow

      // single-row lookahead over the right side (rows copied because
      // the child iterator reuses its row buffer)
      var rRow: InternalRow = null
      var rKey: InternalRow = null
      var rTsVal: Any = null
      def advanceRight(): Unit =
        if (rIt.hasNext) {
          rRow = rIt.next().copy()
          rKey = rKeyProj(rRow).copy()
          rTsVal = rTsEval.eval(rRow)
        } else { rRow = null; rKey = null; rTsVal = null }
      advanceRight()

      // latest right row whose (key, ts) is usable — keys checked
      // against each left row before emitting
      var matchRow: InternalRow = null
      var matchKey: InternalRow = null

      lIt.map { l =>
        val lk = lKeyProj(l)
        val lt = lTsEval.eval(l)
        if (lt != null) {
          var continue = rRow != null
          while (continue) {
            val kc = keyOrd.compare(rKey, lk)
            val usable = kc < 0 || (kc == 0 && rTsVal != null && {
              val tc = tsOrd.compare(rTsVal, lt)
              tc < 0 || (incl && tc == 0)
            })
            val skipNullTs = kc <= 0 && rTsVal == null
            if (usable || skipNullTs) {
              if (kc == 0 && rTsVal != null) { matchRow = rRow; matchKey = rKey }
              advanceRight()
              continue = rRow != null
            } else continue = false
          }
        }
        val pay =
          if (lt != null && matchRow != null && keyOrd.compare(matchKey, lk) == 0)
            payProj(matchRow)
          else nullPay
        resultProj(joined(l, pay))
      }
    }
  }
}
