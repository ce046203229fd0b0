package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-format text sinks (SURVEY §2.1 S4/S5): the reference's
  * tab-separated, %.4f-formatted, basename-configurable text outputs
  * (`mapreduce.output.basename`, task1_1.java:187) and its
  * `MultipleOutputs` multi-sink fan-out (task2_1.java:231-263).
  *
  * Formatting helpers live here so query code can emit byte-compatible
  * lines (P5 composite keys, P6 numeric formatting, P7 sparse-vector
  * serialization) while keeping real columns internally — the encode
  * happens only at the sink boundary.
  */
object Sinks {

  /** `%.4f` fixed formatting (task1_4_1.java:119 et al.). Java and the
    * reference share the Formatter, so this is byte-compatible. */
  def fmt4(c: Column): Column = format_string("%.4f", c)

  /** P5: tab-joined composite key encode (`doc \t term`,
    * task1_1.java:156) — real columns → sink-boundary string. */
  def tabKey(cols: Column*): Column = concat_ws("\t", cols: _*)

  /** P5: underscore-joined composite key (`doc_term`,
    * task1_4_1.java:117). */
  def underscoreKey(cols: Column*): Column = concat_ws("_", cols: _*)

  /** P7: serialize a map<K,double> column to the reference's sparse
    * vector text form `k:w,k:w,...` with %.4f weights, entries sorted
    * by key (task1_4_3_2's comma join; KMeans/Input/TFIDF.txt). */
  def sparseVectorString(mapCol: Column): Column =
    concat_ws(",",
      transform(array_sort(map_entries(mapCol)),
        e => concat(e.getField("key"), lit(":"), fmt4(e.getField("value")))))

  /** P7 inverse: parse `k:w,k:w` into map<string,double>
    * (task2_2.java:131-146 `parse_term_tfidf`). */
  def parseSparseVector(strCol: Column): Column =
    transform_values(
      str_to_map(strCol, lit(","), lit(":")), (_, v) => v.cast("double"))

  /** S4: write a DataFrame as tab-separated text lines under `dir` with
    * a configurable basename (the part-file naming knob the reference
    * sets via `mapreduce.output.basename`). Columns are concat_ws'd in
    * order; callers pre-format numerics (fmt4) for golden parity. */
  def writeTsv(df: DataFrame, dir: String, basename: String): Unit = {
    val line = concat_ws("\t", df.columns.toIndexedSeq.map(col): _*)
    df.select(line.as("value")).write.mode("overwrite")
      .option("compression", "none").text(s"$dir/$basename")
  }

  /** S5: multi-sink fan-out — one cached pass, several derived sinks
    * (the reference's MultipleOutputs writes classes/clusters/topterms/
    * loss from a single reduce). Each sink is an independent action on
    * the shared cached input; Catalyst reuses the materialized plan. */
  def fanOut(df: DataFrame, sinks: (String, DataFrame => DataFrame)*)
            (write: (DataFrame, String) => Unit): Unit = {
    val cached = df.cache()
    try sinks.foreach { case (name, derive) => write(derive(cached), name) }
    finally cached.unpersist()
  }
}
