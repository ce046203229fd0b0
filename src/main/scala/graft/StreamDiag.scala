package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: run ONE streaming query by name and print each
  * micro-batch's StreamingQueryProgress durations (addBatch /
  * getBatch / commitOffsets / stateOperators), so a slow streaming
  * wall can be attributed to source read vs state store vs sink.
  * `runMain graft.StreamDiag <sfDir> <query>`
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
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
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    val s = spark.newSession()
    s.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        println(s"PROGRESS ${e.progress.json}")
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(s, sfDir).write.mode("overwrite").format("noop").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
