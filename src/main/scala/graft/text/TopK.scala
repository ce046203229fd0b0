package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Top-k selection in both semantics (SURVEY T1/T2):
  *  - correct mode: deterministic tie-break, every row distinct;
  *  - compat mode: the reference's TreeMap-keyed-by-value behavior
  *    (task1_3.java:85-92) where equal values COLLAPSE — at most one
  *    row per distinct value survives, the last-processed key wins
  *    (processing order = lexicographic key order).
  */
object TopK {

  /** Global top-k by `valueCol` desc with deterministic tie-break on
    * `keyCol` — plans as TakeOrderedAndProject (per-partition heaps). */
  def global(df: DataFrame, keyCol: String, valueCol: String, k: Int): DataFrame =
    df.orderBy(col(valueCol).desc, col(keyCol)).limit(k)

  /** Reference-compatible global top-k: collapse ties keeping the
    * lexicographically-last key per value (TreeMap.put overwrite under
    * sorted-key iteration), then take the k largest values ascending. */
  def globalCompat(df: DataFrame, keyCol: String, valueCol: String, k: Int): DataFrame = {
    val lastPerValue = df
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(valueCol))
          .orderBy(col(keyCol).cast("string").desc)))
      .filter(col("_rk") === 1).drop("_rk")
    lastPerValue.orderBy(col(valueCol).desc).limit(k)
      .orderBy(col(valueCol)) // reference emits ascending
  }

  /** Per-group top-k with deterministic tie-break (ranked window;
    * WindowGroupLimit prunes below the sort at scale). */
  def perGroup(df: DataFrame, groupCol: String, keyCol: String,
               valueCol: String, k: Int): DataFrame =
    df.withColumn("rk", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col(valueCol).desc, col(keyCol))).cast("long"))
      .filter(col("rk") <= k)

  /** Per-group compat mode: value-collapse then k largest per group. */
  def perGroupCompat(df: DataFrame, groupCol: String, keyCol: String,
                     valueCol: String, k: Int): DataFrame = {
    val lastPerValue = df
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(groupCol), col(valueCol))
          .orderBy(col(keyCol).cast("string").desc)))
      .filter(col("_rk") === 1).drop("_rk")
    lastPerValue.withColumn("rk", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col(valueCol).desc)).cast("long"))
      .filter(col("rk") <= k)
  }
}
