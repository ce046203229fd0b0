package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable frequency/distinct sketches via the Spark built-ins
  * (DataSketches HLL, Count-Min — codegen'd aggregation, no UDF in
  * the build path). The 100 TB story is MERGEABILITY: a sketch built
  * per shard/partition/day can be unioned later into any coarser
  * rollup without touching the raw data again, and the union equals
  * the sketch you'd have built in one global pass (asserted in
  * SketchesSpec). That makes distinct-count rollups an O(sketch-size)
  * metadata operation instead of a re-scan — the pre-aggregated-cube
  * pattern for COUNT(DISTINCT) — and point-frequency lookup an
  * O(width×depth) probe instead of a GROUP BY over the raw table.
  */
object Sketches {

  /** Executor-side probe wrapper: ships the serialized sketch once per
    * task closure, deserializes once per executor (transient lazy),
    * probes per row. */
  private class CmsProbe(bytes: Array[Byte]) extends Serializable {
    @transient private lazy val cms =
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    def estimate(k: Long): Long = cms.estimateCount(k)
  }

  /** Count-Min point-frequency estimates for every distinct value of
    * `keyCol` (must be integral). The sketch is built by Spark's
    * mergeable `count_min_sketch` aggregate — partial sketches
    * map-side, O(width×depth) state through the shuffle — then the
    * O(100 KB) result is fetched driver-side (1 row, the same O(1)
    * contract as a K-Means model) and probed per key.
    *
    * CMS guarantees estimate ≥ true count, with overestimate ≤ eps·N
    * at the given confidence; with #distinct ≪ width (2/eps) the
    * probability that any key collides in ALL depth rows is
    * negligible and the estimates are EXACTLY the true counts — the
    * collision-free regime, this family's oracle-green anchor (the
    * q103 coupon-regime trick applied to frequency instead of
    * cardinality). Everything is seed-deterministic either way.
    */
  def countMinEstimates(df: DataFrame, keyCol: String, eps: Double = 5e-4,
                        confidence: Double = 0.999, seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"countMinEstimates requires an integral keyCol; '$keyCol' is $other " +
          "(a non-integral column would hash in a different domain at build " +
          "vs probe time)")
    }
    // build and probe in the SAME domain: cast to long before sketching
    val keyed = df.select(col(keyCol).cast("long").as(keyCol))
    val bytes = keyed
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)))
      .first().getAs[Array[Byte]](0)
    val probe = udf(new CmsProbe(bytes).estimate _)
    keyed.distinct().withColumn("est", probe(col(keyCol)))
  }

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

  /** ROLLING DISTINCT via sketch-window rollup — the 24-hour sliding
    * COUNT(DISTINCT) answered from per-hour HLL cells instead of the
    * raw log: build one sketch per (key, hour) — O(sketch) state each
    * — then `hll_union_agg` over a 23-PRECEDING row window of the
    * tiny hourly-cell table. The raw data is touched once; the
    * window slides over cells, so a year of log at any volume costs
    * 8760 sketch merges per key, not 24 re-scans per hour. In the
    * coupon regime every rolling estimate is the exact distinct
    * count (the q103/q231 contract).
    *
    * @return (key, hr, rolling_distinct) per populated hour. */
  def rollingDistinct(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, hours: Int = 24,
                      lgK: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .select(col(keyCol).as("k"),
        expr(s"unix_micros(`$tsCol`) div 3600000000").as("hr"),
        col(valueCol).as("v"))
      .groupBy(col("k"), col("hr"))
      .agg(hll_sketch_agg(col("v"), lit(lgK)).as("sketch"))
    // RANGE frame on the hour index: 24 CLOCK hours — an empty hour
    // narrows the merge set instead of silently stretching the window
    val w = Window.partitionBy(col("k")).orderBy(col("hr"))
      .rangeBetween(-(hours - 1), Window.currentRow)
    cells
      .withColumn("rolling_distinct",
        hll_sketch_estimate(hll_union_agg(col("sketch")).over(w))
          .cast("long"))
      .select(col("k").as(keyCol), col("hr"), col("rolling_distinct"))
  }

  /** EXACT rolling distinct — the same sliding COUNT(DISTINCT) as
    * [[rollingDistinct]] but through the chunked-BITMAP aggregate
    * (q215's Roaring pattern) over the deduplicated (key, hour,
    * value) tuple table: the RANGE window re-merges exact bitmap
    * partials per frame, so the count is exact at ANY cardinality —
    * no coupon space to collide in. (The sf0.1 sweep caught the HLL
    * variant one-off at ~388 distinct per window: a coupon-space
    * birthday collision — approximate by design; THIS is the
    * declared-oracle path, the HLL one remains the
    * lower-memory approximation pinned by SketchesSpec.)
    *
    * Scale: the window runs over distinct (key, hour, value) tuples —
    * one dedup shuffle compresses the raw log; frames span `hours`
    * clock hours via the RANGE bound. */
  def rollingDistinctExact(df: DataFrame, keyCol: String, tsCol: String,
                           valueCol: String, hours: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bd = org.apache.spark.sql.functions.udaf(
      new graft.functions.BitmapDistinctAggregator,
      org.apache.spark.sql.Encoders.scalaLong)
    val u = df.select(col(keyCol).as("k"),
        expr(s"unix_micros(`$tsCol`) div 3600000000").as("hr"),
        col(valueCol).cast("long").as("v"))
      .distinct()
    val w = Window.partitionBy(col("k")).orderBy(col("hr"))
      .rangeBetween(-(hours - 1), Window.currentRow)
    u.withColumn("rolling_distinct", bd(col("v")).over(w))
      .select(col("k").as(keyCol), col("hr"), col("rolling_distinct"))
      .distinct()
  }

  /** SKETCH SET ALGEBRA over the per-cell sketches of
    * [[distinctSketch]]: for every pair of `keyCol` values within a
    * `cellCol` cell, |A|, |B|, |A∪B| straight from register math
    * (pairwise `hll_union`), and |A∩B| by inclusion–exclusion.
    * This is the audience-overlap / cross-segment-reach query — "how
    * many users did both A and B" — answered from O(sketch) state
    * with NO return to the raw data: the join runs over the tiny
    * cell×key sketch table, so overlap across any two of K segments
    * costs K²·sketch-size, not a re-scan of the event log.
    *
    * In the coupon regime (cell unions below k/4 at the chosen lgK)
    * every estimate is the exact distinct count — the oracle anchor,
    * same contract as the q103 cells. */
  def setAlgebra(cells: DataFrame, keyCol: String, cellCol: String)
      : DataFrame = {
    val a = cells.select(col(keyCol).as("k_a"), col(cellCol),
      col("sketch").as("sk_a"))
    val b = cells.select(col(keyCol).as("k_b"), col(cellCol),
      col("sketch").as("sk_b"))
    a.join(b, Seq(cellCol)).filter(col("k_a") < col("k_b"))
      .select(col("k_a"), col("k_b"), col(cellCol),
        hll_sketch_estimate(col("sk_a")).cast("long").as("n_a"),
        hll_sketch_estimate(col("sk_b")).cast("long").as("n_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .cast("long").as("n_union"))
      .withColumn("n_inter", col("n_a") + col("n_b") - col("n_union"))
  }
}
