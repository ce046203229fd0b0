package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (DataSketches HLL via the Spark
  * built-ins — codegen'd, no UDFs). The 100 TB story is MERGEABILITY:
  * a sketch built per shard/partition/day can be unioned later into
  * any coarser rollup without touching the raw data again, and the
  * union equals the sketch you'd have built in one global pass
  * (asserted in SketchesSpec). That makes distinct-count rollups an
  * O(sketch-size) metadata operation instead of a re-scan — the
  * pre-aggregated-cube pattern for COUNT(DISTINCT).
  */
object Sketches {

  /** Per-group HLL sketch partials over `valueCol`. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge partial sketches up to a coarser key set (e.g. drop the
    * shard column) — no raw-data access. */
  def mergeSketches(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Attach the cardinality estimate. */
  def estimate(sketches: DataFrame): DataFrame =
    sketches.withColumn("approx_distinct",
      hll_sketch_estimate(col("sketch")).cast("long"))
}
