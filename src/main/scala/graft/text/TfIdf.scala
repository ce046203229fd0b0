package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's TF-IDF corpus pipeline re-expressed as lazy DataFrame
  * transforms (SURVEY §2.11): token counts → frequency filter → TF →
  * IDF = ln(N/df) → TF·IDF. One Catalyst plan end-to-end instead of five
  * chained MapReduce jobs (reference: BigDataLab02/DataProcessing/
  * task1_1.java, task1_2.java, task1_4_1/2/3.java).
  *
  * Determinism: TF and IDF are single divisions of exact integer counts,
  * and TF·IDF a single product of those quotients — bit-identical across
  * engines and partitionings (no accumulated double sums).
  *
  * Scale notes (100 TB): every aggregation here is a hash-partitioned
  * `groupBy` on (doc, term) or (term) with map-side partial aggregation
  * (Catalyst adds the combiner the reference never registered —
  * task1_1.java:179-195 shuffles raw 1s). The per-doc total uses a
  * window over `doc` — same shuffle key as the counts, so AQE coalesces;
  * no driver-side state anywhere except the O(1) doc count N.
  */
object TfIdf {

  /** (doc, term, cnt) matrix from a token table (SURVEY A1).
    * Reference: task1_1.java:141-177 (word count per doc+term). */
  def termCounts(tokens: DataFrame, docCol: String): DataFrame =
    tokens.groupBy(col(docCol), col("token").as("term"))
      .agg(count(lit(1)).as("cnt"))

  /** Frequency filter, keep cnt >= minCount (SURVEY F1).
    * Reference: task1_2.java:53-55 (threshold 3, map-only job). */
  def filterMin(counts: DataFrame, minCount: Int): DataFrame =
    counts.filter(col("cnt") >= minCount)

  /** TF = cnt / Σ cnt over the doc (SURVEY A3).
    * Window over the same key as the upstream groupBy — Catalyst reuses
    * the exchange instead of a second shuffle.
    * Reference: task1_4_1.java:80-127. */
  def tf(counts: DataFrame, docCol: String): DataFrame = {
    val w = Window.partitionBy(col(docCol))
    counts.withColumn("tf",
      col("cnt").cast("double") / sum(col("cnt")).over(w).cast("double"))
  }

  /** IDF = ln(N / df) where df = #docs containing the term and N = #docs
    * in `counts` (SURVEY A4). Mirrors the reference quirk of computing
    * both from the *filtered* matrix (task1_4_2 reads task1_2's output;
    * SURVEY §7.4.6). The reference needs a single reducer holding global
    * state (task1_4_2.java:63-106); here N rides a broadcast scalar
    * crossJoin (round-12, measured: the old `distinct().count()` was a
    * BLOCKING driver action serializing every docVectors build for
    * 0.24-0.56 s while the rest of the chain waited — as a 1-row
    * broadcast the N-aggregation pipelines with the term aggregation;
    * identical arithmetic, `n` cast to double either way). */
  def idf(counts: DataFrame, docCol: String): DataFrame = {
    val n = counts.select(col(docCol)).distinct()
      .agg(count(lit(1)).as("_n"))
    counts.groupBy(col("term"))
      .agg(count(lit(1)).as("df")) // counts has one row per (doc,term)
      .crossJoin(broadcast(n))
      // ln() differs by 1 ulp between libm implementations — round to 9
      // decimals so downstream products are bit-identical across engines.
      .withColumn("idf",
        round(log(col("_n").cast("double") / col("df").cast("double")), 9))
      .drop("_n")
  }

  /** TF·IDF join (SURVEY J3) — the IDF side is tiny (one row per term),
    * broadcast it like the reference's distributed-cache lookup
    * (task1_4_3.java:84-94). */
  def tfidf(tfDf: DataFrame, idfDf: DataFrame): DataFrame =
    tfDf.join(broadcast(idfDf.select("term", "idf")), Seq("term"))
      .withColumn("tfidf", col("tf") * col("idf"))

  /** Full pipeline: tokens → filtered counts → TF·IDF rows
    * (doc, term, cnt, tf, idf, tfidf). */
  def pipeline(tokens: DataFrame, docCol: String, minCount: Int): DataFrame = {
    val filtered = filterMin(termCounts(tokens, docCol), minCount)
    tfidf(tf(filtered, docCol), idf(filtered, docCol))
  }

  /** Doc vectors: term→tfidf map per doc (reference's string-encoded
    * sparse vectors, task1_4_3_2.java / KMeans/Input/TFIDF.txt —
    * SURVEY P7 — as a first-class MapType column). */
  def docVectors(tfidfDf: DataFrame, docCol: String): DataFrame =
    tfidfDf.groupBy(col(docCol))
      .agg(map_from_entries(collect_list(struct(col("term"), col("tfidf"))))
        .as("vec"))
}
