package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ZONE-MAP construction and data-skipping effectiveness report — the
  * min/max-per-block statistics parquet row groups, Delta/Iceberg file
  * stats, and warehouse zone maps all rely on. Building it FOR a
  * candidate sort layout answers the layout question offline: "if we
  * rewrote this table ordered by k, what fraction of blocks would
  * predicate P skip?" — the complement of the Z-order family (q78/
  * q87), which optimizes multi-column layouts; this measures what a
  * layout buys.
  *
  * Shape: one distributed range-partitioned sort on the layout key +
  * `zipWithIndex` for exact global block ids (per-partition offsets
  * from one lightweight count job — the q96 dense-id machinery, no
  * single-partition window), then a block-keyed partial agg for
  * min/max/count. At 100 TB the sort is the same work the layout
  * rewrite itself would do; the report is O(N/blockSize) rows.
  */
object ZoneMap {

  /** Per-block zone map of `keyCol` (rendered as a string, compared
    * lexicographically — dates as yyyy-MM-dd work as-is) under the
    * layout sorted by (keyCol, tieCols…), plus a `would_skip` flag
    * for the half-open predicate range [predLo, predHi].
    *
    * Output: block, n_rows, k_min, k_max, would_skip. */
  def report(df: DataFrame, keyCol: Column, tieCols: Seq[Column],
             blockSize: Int, predLo: String, predHi: String): DataFrame = {
    require(blockSize >= 1, "blockSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val blocks = df
      .select(keyCol.cast("string").as("k"),
        concat_ws("|", tieCols.map(_.cast("string")): _*).as("tie"))
      .orderBy(col("k"), col("tie"))
      .rdd.map(_.getString(0))
      .zipWithIndex()
      .map { case (k, i) => (i / blockSize, k) }
      .toDF("block", "k")
    blocks.groupBy(col("block"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .withColumn("would_skip",
        col("k_max") < lit(predLo) || col("k_min") >= lit(predHi))
      .orderBy(col("block"))
  }

  /** LAYOUT-SKIPPING COMPARISON — the A/B the Z-order family exists
    * to win, measured instead of asserted: the SAME rows laid out
    * (a) lexicographically by (x, y) and (b) by the Z-interleave of
    * (x, y), each cut into `blockSize` blocks with (x, y) min/max
    * zone maps, scored against one 2-D predicate box. Lexicographic
    * order makes y-ranges within a block span the whole domain once
    * x repeats — only the leading column prunes; the space-filling
    * curve keeps BOTH dimensions locally bounded, so the same box
    * skips far more blocks. Output is the offline justification for
    * a table-layout rewrite.
    *
    * Same machinery as [[report]]: one distributed sort +
    * zipWithIndex per layout, block-keyed partial aggs.
    *
    * @return one row per layout: (layout, n_blocks, n_skipped,
    *         skip_ratio9, rows_scanned). */
  def layoutSkipping(df: DataFrame, xCol: Column, yCol: Column,
                     tieCols: Seq[Column], blockSize: Int,
                     xLo: Long, xHi: Long, yLo: Long, yHi: Long)
      : DataFrame = {
    require(blockSize >= 1, "blockSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"),
      concat_ws("|", tieCols.map(_.cast("string")): _*).as("tie"))
    def run(layout: String, okey: Column): DataFrame = {
      val blocks = base
        .withColumn("ok", okey)
        .orderBy(col("ok"), col("tie"))
        .rdd.map(r => (r.getLong(0), r.getLong(1)))
        .zipWithIndex()
        .map { case ((x, y), i) => (i / blockSize, x, y) }
        .toDF("blk", "x", "y")
      blocks.groupBy(col("blk"))
        .agg(count(lit(1)).as("c"), min(col("x")).as("x0"),
          max(col("x")).as("x1"), min(col("y")).as("y0"),
          max(col("y")).as("y1"))
        .withColumn("skipped",
          col("x1") < xLo || col("x0") > xHi ||
            col("y1") < yLo || col("y0") > yHi)
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("skipped").cast("long")).as("n_skipped"),
          sum(when(!col("skipped"), col("c")).otherwise(0L))
            .as("rows_scanned"))
        .select(lit(layout).as("layout"), col("n_blocks"), col("n_skipped"),
          round(col("n_skipped").cast("double") /
            col("n_blocks").cast("double"), 9).as("skip_ratio9"),
          col("rows_scanned"))
    }
    run("lex", col("x") * 65536L + col("y"))
      .unionByName(run("zorder", ZOrder.zValue(col("x"), col("y"))))
  }

  /** CLUSTERING DEPTH of a file layout (the OPTIMIZE/Z-ORDER
    * effectiveness metric lakehouse table services report): given one
    * (lo, hi) zone per file for a probe column, the depth at a point
    * is how many file ranges cover it — a point query must read that
    * many files — and the table's clustering depth is the MAXIMUM
    * over all points. Depth 1 = perfectly clustered (disjoint
    * ranges); depth ≈ n_files = the column is unclustered and zone
    * maps skip nothing.
    *
    * Exact boundary sweep: each file contributes (+1 at lo, −1 at
    * hi+1); the running sum ordered by (pos, delta — closes before
    * opens at the same integer point, half-open semantics) peaks at
    * the depth. The sweep table is O(n_files) METADATA, not data —
    * the single-partition window here is over 2·files rows, the same
    * O(files) driver-scale state every table service holds.
    *
    * @param files one row per file: (lo, hi) inclusive integer zone.
    * @return one row: (n_files, max_depth). */
  def clusteringDepth(files: DataFrame): DataFrame = {
    val ev = files.select(col("lo").as("pos"), lit(1L).as("d"))
      .unionAll(files.select((col("hi") + 1).as("pos"), lit(-1L).as("d")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pos"), col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ev.withColumn("depth", sum(col("d")).over(w))
      .agg((count(lit(1)) / 2).cast("long").as("n_files"),
        max(col("depth")).as("max_depth"))
  }
}
