package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated by any other
  * row, where q dominates p iff q is ≥ p on the maximized dimension,
  * ≤ p on the minimized one, and strictly better on at least one.
  * The classic multi-objective shortlist operator (price/performance
  * frontiers, quality/length corpus triage).
  *
  * Spark-first shape — the 2-D skyline has an exact ONE-SORT window
  * formulation (Börzsönyi et al. ICDE 2001's sort-filter-skyline,
  * expressed declaratively instead of as a stateful scan): order by
  * the maximized dimension descending; a row survives iff
  *   - no row with a STRICTLY larger max-dim has min-dim ≤ ours
  *     (running `min` over the strictly-preceding RANGE frame), and
  *   - no row ties our max-dim with a strictly smaller min-dim
  *     (`min` over the max-dim peer group).
  * Both minima come from the same sort, so dominance never needs a
  * pair join — the quadratic NOT EXISTS the oracle runs is exactly
  * what this plan avoids.
  *
  * Scale (100 TB): a single global window is one range-partitioned
  * sort, but its final window still evaluates every row. So phase 1
  * runs the same window PER HASH BUCKET (embarrassingly parallel,
  * no global sort): dominance inside a bucket implies dominance
  * globally, so bucket-local survivors are a superset of the skyline.
  * 2-D skylines of random data are O(log n) per bucket, so phase 2's
  * global window runs over a vanishing survivor set. The same
  * local-prune/global-merge split is how distributed skyline papers
  * (e.g. Vlachou et al., angle-based partitioning) structure the
  * computation.
  */
object Skyline {

  private def prune(in: DataFrame, maxCol: String, minCol: String,
                    bucket: Seq[Column]): DataFrame = {
    // RANGE ... TO -1 on a descending integer ordering = rows whose
    // maxCol is STRICTLY larger (current + 1 and beyond)
    val larger = Window.partitionBy(bucket: _*)
      .orderBy(col(maxCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val peers = Window.partitionBy(bucket :+ col(maxCol): _*)
    in.withColumn("_min_larger", min(col(minCol)).over(larger))
      .withColumn("_min_peer", min(col(minCol)).over(peers))
      .filter((col("_min_larger").isNull || col("_min_larger") > col(minCol))
        && col("_min_peer") >= col(minCol))
      .drop("_min_larger", "_min_peer")
  }

  /** Skyline of `df` maximizing integer column `maxCol` and minimizing
    * `minCol`. All input columns pass through. */
  def pareto2D(df: DataFrame, maxCol: String, minCol: String,
               nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1)
    val bucketed = df.withColumn("_b",
      pmod(xxhash64(col(maxCol), col(minCol)), lit(nBuckets)))
    val local = prune(bucketed, maxCol, minCol, Seq(col("_b"))).drop("_b")
    prune(local, maxCol, minCol, Nil)
  }
}
