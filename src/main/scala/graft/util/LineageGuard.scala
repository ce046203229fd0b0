package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage-depth hygiene for driver-side greedy loops.
  *
  * Iterative operators that rebuild a DataFrame per round
  * (`state = f(state)`) grow the LOGICAL plan by one node per round
  * even when every round is cached — caching short-circuits
  * re-execution, not re-ANALYSIS, so round k pays O(k) planning and
  * the loop totals O(k²) driver work (and, on a real cluster, an
  * ever-longer recovery lineage). The standing policy written at
  * [[graft.ops.Graph]] — checkpoint every N rounds — truncates that:
  * `localCheckpoint(eager = true)` materializes the current rows into
  * block storage and replaces the plan with a leaf scan, so depth is
  * bounded by N regardless of k.
  *
  * [[depth]]/[[record]] exist so specs can ASSERT the bound (the
  * loops record their max observed analyzed-plan size per tag;
  * LineageGuardSpec pins that k = 50 stays under the N-round ceiling
  * — the round-8 verdict's "bounded plan depth at k=50" criterion).
  */
object LineageGuard {

  /** Checkpoint cadence for greedy/BSP loops (rounds between lineage
    * truncations — small enough to bound planning, large enough to
    * amortize the materialization). */
  val CheckpointEvery = 8

  /** Total node count of the analyzed logical plan. */
  def depth(df: DataFrame): Int =
    df.queryExecution.analyzed.collectLeaves().size +
      df.queryExecution.analyzed.collect { case p => p }.size

  /** Max observed analyzed-plan size per loop tag (test-only
    * observability; loops are driver-sequential so a plain map with
    * monitor access suffices). */
  private val observed = scala.collection.concurrent.TrieMap.empty[String, Int]

  def record(tag: String, df: DataFrame): Unit = {
    val d = depth(df)
    observed.updateWith(tag) {
      case Some(prev) => Some(math.max(prev, d))
      case None => Some(d)
    }
    ()
  }

  def maxObserved(tag: String): Int = observed.getOrElse(tag, 0)

  def reset(tag: String): Unit = { observed.remove(tag); () }
}
