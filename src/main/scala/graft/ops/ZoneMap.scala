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
}
