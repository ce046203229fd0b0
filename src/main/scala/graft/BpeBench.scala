package graft

import org.apache.spark.sql.SparkSession

/** Measured evidence for the incremental BPE trainer (round-5 verdict
  * ask #4): times `learnMerges` (k full re-encode passes) vs
  * `learnMergesIncremental` (one-merge delta maintenance) on the same
  * corpus and prints one JSON line with per-k seconds. Run:
  * `sbt "runMain graft.BpeBench /root/testdata/sf0.1 8"`. */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val kMax = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = graft.io.Tables.documents(spark, sfDir)
    // Wide-vocabulary variant: suffix every word occurrence with
    // doc_id % 1000 — same corpus volume, ~1000x the distinct words.
    // The synthetic corpus' ~31-term vocabulary hides the incremental
    // trainer's asymptotics (per-round cost is all fixed overhead);
    // a web-scale corpus looks like THIS, not like the 31-term one.
    val wide = docs.select(col("doc_id"),
      concat_ws(" ", transform(split(col("text"), "\\s+"),
        w => concat(w, lit("_"), col("doc_id") % 1000))).as("text"))
    wide.cache().count()
    docs.count() // warm the scan
    def timed(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val ks = Seq(1, 2, 4, kMax).distinct.sorted
    def sweep(d: org.apache.spark.sql.DataFrame) = (
      ks.map(k => k -> timed(graft.ops.BpeTrainer.learnMerges(d, "text", k))),
      ks.map(k => k -> timed(graft.ops.BpeTrainer.learnMergesIncremental(d, "text", k))))
    val (naive, inc) = sweep(docs)
    val (naiveW, incW) = sweep(wide)
    def js(xs: Seq[(Int, Double)]) =
      xs.map { case (k, s) => s""""k$k":${math.rint(s * 100) / 100}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"bpe_trainer","naive":${js(naive)},"incremental":${js(inc)},""" +
      s""""naive_widevocab":${js(naiveW)},"incremental_widevocab":${js(incW)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
