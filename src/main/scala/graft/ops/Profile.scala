package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column null counts and exact
  * distinct cardinalities in one declared pass — the statistics a
  * warehouse collects to drive join planning, and the first data-QA
  * report any new ingest gets (a column whose distinct count is 1 is
  * dead; one whose null rate jumped is a broken upstream extractor).
  *
  * Shape: ONE `agg` carrying `count(col)` + `count(distinct col)` per
  * column — Catalyst compiles the multi-distinct into a single Expand
  * (×columns row amplification) with partial aggregation on every
  * path, so the table is still read once and the shuffle carries
  * O(distinct values) rows, not data. The wide one-row result then
  * unpivots via `stack` into the (column, stats) long form. For a
  * quick-look profile at 100 TB swap the exact distinct for
  * `approx_count_distinct` (HLL, no Expand) — exact is declared here
  * because it is the oracle-checkable contract.
  */
object Profile {

  /** @return (column_name, n_rows, n_null, n_distinct) per column. */
  def columnProfile(df: DataFrame): DataFrame = {
    val names = df.schema.fieldNames.toSeq
    val aggs = names.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c"))
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = names.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    row.selectExpr("n_rows",
        s"stack(${names.length}, $stackArgs) AS (column_name, n_non_null, n_distinct)")
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_null"), col("n_distinct"))
      .orderBy(col("column_name"))
  }
}
