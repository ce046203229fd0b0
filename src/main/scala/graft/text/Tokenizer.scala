package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenization pipeline with the reference's exact operator order:
  * lowercase → strip punctuation (`[^\w\s]` → "") → whitespace split →
  * drop empty tokens and stop words.
  * (SURVEY §2.2 P1–P4; reference: BigDataLab02/DataProcessing/task1_1_1.java:107-118 —
  * order matters for parity: strip happens after lowering, before the
  * stop-word check.)
  *
  * Everything is `org.apache.spark.sql.functions` built-ins so the whole
  * stage stays inside whole-stage codegen; the stop-word filter is a
  * literal `isin` (a 300-word IN list folds to a hash set in codegen —
  * the reference's distributed-cache lookup, task1_1_1.java:66-77,
  * without the side file). For stop lists too large to inline, use
  * a `broadcast` left_anti join instead.
  */
object Tokenizer {

  /** Default stop list for the synthetic `documents` corpus. The
    * reference ships a 300-word list (StopWords/stop_words.txt); the
    * synthetic 31-word vocabulary only contains these function words. */
  val defaultStopWords: Seq[String] = Seq("the", "a")

  /** Explode `textCol` of `df` into one row per kept token, column
    * `token`, all original columns preserved. */
  def tokens(df: DataFrame, textCol: String,
             stopWords: Seq[String] = defaultStopWords): DataFrame = {
    val cleaned = regexp_replace(lower(col(textCol)), "[^\\w\\s]", "")
    val tok     = explode(split(cleaned, "\\s+")).as("token")
    val kept    = df.withColumn("token", tok)
      .filter(length(col("token")) > 0)
    if (stopWords.isEmpty) kept
    else kept.filter(!col("token").isin(stopWords: _*))
  }

  /** Same contract with the stop filter as a broadcast left_anti join —
    * for stop lists too large to inline as an IN literal (the
    * reference's distributed-cache pattern, SURVEY J1). Result-equal to
    * [[tokens]]; column set too (the join key is dropped back). */
  def tokensAntiJoin(df: DataFrame, textCol: String,
                     stopWords: DataFrame): DataFrame = {
    val cleaned = regexp_replace(lower(col(textCol)), "[^\\w\\s]", "")
    val kept = df.withColumn("token", explode(split(cleaned, "\\s+")))
      .filter(length(col("token")) > 0)
    kept.join(broadcast(stopWords.select(col(stopWords.columns.head).as("token"))),
      Seq("token"), "left_anti")
  }
}
