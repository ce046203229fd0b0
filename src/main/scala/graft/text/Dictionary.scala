package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dense sequential ID assignment (SURVEY A2) — the reference builds
  * term/doc dictionaries with a single-reducer counter over the sorted
  * key stream (task1_1_1.java:121-135), ids 1..N in lexicographic
  * order.
  *
  * Two implementations with identical results:
  *  - [[denseIds]]: single-partition window `row_number` — fine for
  *    dictionary-sized inputs (34k terms), serial by construction.
  *  - [[denseIdsScalable]]: sort → `zipWithIndex` — distributed (per-
  *    partition counts + offset), the 100 TB path (SURVEY §7.4.2).
  */
object Dictionary {

  /** (key, id) with ids 1..N in key order; single-partition window. */
  def denseIds(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol)).distinct()
      .withColumn("id", row_number().over(Window.orderBy(col(keyCol))).cast("long"))

  /** Same contract, distributed: global sort establishes range
    * partitioning, zipWithIndex adds per-partition offsets with one
    * lightweight count job — no single-task bottleneck. */
  def denseIdsScalable(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string")).distinct()
      .orderBy(col(keyCol))
      .rdd.map(_.getString(0))
      .zipWithIndex()
      .map { case (k, i) => (k, i + 1) }
      .toDF(keyCol, "id")
  }

  /** INCREMENTAL dictionary maintenance — extend an existing
    * (key, id) dictionary with a new batch's keys WITHOUT renumbering:
    * existing ids are frozen (downstream feature tables, embedding
    * rows, and model vocabularies keyed on them stay valid), and only
    * genuinely new keys get ids `max_id+1..` in key order. This is
    * the lakehouse answer to "the dictionary is append-only state,
    * not a per-run artifact": re-running [[denseIds]] on the grown
    * corpus would reshuffle every id on any vocabulary change.
    *
    * Scale: the batch anti-joins the existing dictionary (one equi
    * join), and only the DELTA — vocabulary growth, sublinear in
    * corpus growth — pays the [[denseIdsScalable]] sort+zipWithIndex.
    *
    * @return (keyCol, id, is_new) — old rows verbatim with is_new=0,
    *         delta rows offset past the old max with is_new=1. */
  def mergeDelta(existing: DataFrame, batch: DataFrame,
                 keyCol: String): DataFrame = {
    val newKeys = batch.select(col(keyCol)).distinct()
      .join(existing.select(col(keyCol)), Seq(keyCol), "left_anti")
    val base = existing.agg(coalesce(max(col("id")), lit(0L)).as("_base"))
    val delta = denseIdsScalable(newKeys, keyCol)
      .crossJoin(broadcast(base))
      .select(col(keyCol), (col("_base") + col("id")).as("id"),
        lit(1L).as("is_new"))
    existing.select(col(keyCol), col("id"), lit(0L).as("is_new"))
      .union(delta)
  }
}
