package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.{TfIdf, Tokenizer}

/** Scratch profiling main for the shared TF-IDF docVectors build
  * (round-12, r11 verdict item 7): times each stage of
  * tokenize → termCounts → filterMin → tf → idf → join → pivot-to-map
  * cache-cold with the noop sink, so the expensive step is measured,
  * not guessed. Not part of the declared surface.
  * `sbt "runMain graft.DocVecLab [sfDir]"`.
  */
object DocVecLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").limit(100).count()

    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TIMED $label $s%.3f s"); s
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def gc(): Unit = { System.gc(); Thread.sleep(1000); System.gc() }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (pass <- 1 to 2) {
      println(s"== pass $pass")
      gc()
      val toks = Tokenizer.tokens(docs, "text")
      timed("a_tokenize") { noop(toks) }
      val fcRaw = TfIdf.filterMin(TfIdf.termCounts(toks, "doc_id"), 2)
      timed("b_fc_raw_noop") { noop(fcRaw) }
      val fc = fcRaw.cache()
      timed("c_fc_cache_build") { fc.count(); () }
      timed("d_n_distinct_count") {
        fc.select(col("doc_id")).distinct().count(); ()
      }
      val tfDf = TfIdf.tf(fc, "doc_id")
      timed("e_tf_window") { noop(tfDf) }
      val idfDf = TfIdf.idf(fc, "doc_id")
      timed("f_idf_agg") { noop(idfDf) }
      val tfidf = TfIdf.tfidf(tfDf, idfDf)
      timed("g_tfidf_join") { noop(tfidf) }
      val dv = TfIdf.docVectors(tfidf, "doc_id")
      timed("h_pivot_to_map") { noop(dv) }
      val dvc = dv.coalesce(math.max(2, spark.sparkContext.defaultParallelism / 4))
      timed("i_full_chain_coalesce_cache") { val c = dvc.cache(); c.count(); () }
      timed("j_read_back_from_cache") { noop(dvc) }
      graft.util.Caches.clearAll(spark)
    }
    spark.stop()
  }
}
