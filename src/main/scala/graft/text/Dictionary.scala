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
}
