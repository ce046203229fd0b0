package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the round-10 isolated-streaming regression
  * (q309/q310/q311 walls 2–3.7× up with zero code change): times the
  * named queries one at a time on a fresh JVM, optionally after
  * CONTAMINATING the session the way a full Bench run does — N
  * retained memory-sink tables (the accumulated result tables of
  * earlier streaming passes) and/or a batch-query burn-in — so the
  * hypothesis "late-JVM heap/table accumulation, not the queries"
  * is directly measurable.
  *
  * `runMain graft.StreamLab <sfDir> <q1,q2,…> [memTables] [burnin]`
  */
object StreamLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val memTables = if (args.length > 2) args(2).toInt else 0
    val burnin = args.length > 3 && args(3) == "burnin"
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
    // contamination arm A: memory-sink tables full of event rows, the
    // exact residue a Bench pass leaves behind (each streaming query's
    // result table is never dropped)
    if (memTables > 0) {
      (1 to memTables).foreach { i =>
        val q = graft.io.Tables.eventsStream(spark, sfDir)
          .writeStream.outputMode("append")
          .format("memory").queryName(s"contam_$i").start()
        q.processAllAvailable(); q.stop()
      }
      println(s"contaminated: $memTables memory tables, " +
        s"heap used ${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1048576} MB")
      if (args.length > 3 && args(3) == "drop") {
        (1 to memTables).foreach(i => spark.catalog.dropTempView(s"contam_$i"))
        System.gc(); Thread.sleep(2000); System.gc()
        println(s"dropped: heap used ${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1048576} MB")
      }
    }
    // contamination arm C: replay Bench's concurrent streaming-group
    // passes (each query on its own cloned session, stream_* views
    // dropped after, exactly like Bench.timedOne) before timing — the
    // residue hypothesis "earlier streaming queries inflate the late
    // isolated pass" made directly measurable.
    if (args.length > 3 && args(3).startsWith("group")) {
      // "group2" = 2 passes, unbounded pool; "group2p6" = 2 passes on a
      // 6-thread pool (the §2.6 bounded-in-flight experiment) — prints
      // the GROUP WALL per pass so pool sizes can be A/B'd directly
      val spec = args(3).stripPrefix("group")
      val (passes, pool) = spec.split("p") match {
        case Array(n, p) => (n.toInt, p.toInt)
        case Array(n) if n.nonEmpty => (n.toInt, 0)
        case _ => (1, 0)
      }
      val group = Seq("q41_stream_hourly", "q42_stream_sessionize",
        "q57_stream_dedup", "q64_stream_stream_join", "q101_stream_static_join",
        "q107_stream_session_window", "q122_stream_cdc_upsert",
        "q169_stream_hopping", "q309_stream_dedup_bounded",
        "q310_stream_transform_state", "q311_stream_outer_join",
        "q333_stream_fp_dedup", "q335_grec_stream_read", "q336_grec_stream_sink",
        "q319_stream_chained_agg", "q358_stream_crawl_incremental",
        "q359_stream_url_frontier")
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      // daemon threads: a plain fixed pool is non-daemon and keeps the
      // JVM alive after main() returns
      implicit val ec: ExecutionContext =
        if (pool <= 0) ExecutionContext.global
        else ExecutionContext.fromExecutorService(
          java.util.concurrent.Executors.newFixedThreadPool(pool, r => {
            val t = new Thread(r); t.setDaemon(true); t
          }))
      (1 to passes).foreach { p =>
        val w0 = System.nanoTime()
        val walls = Await.result(Future.sequence(group.map { n => Future {
          val s = spark.newSession()
          val t0 = System.nanoTime()
          try SparkEntry.queries(n)(s, sfDir)
            .write.mode("overwrite").format("noop").save()
          catch { case e: Throwable => println(s"contam $n: ${e.getMessage}") }
          val sec = (System.nanoTime() - t0) / 1e9
          try s.catalog.listTables().collect()
            .filter(t => t.isTemporary && t.name.startsWith("stream_"))
            .foreach(t => s.catalog.dropTempView(t.name))
          catch { case _: Throwable => () }
          n -> sec
        } }), Duration.Inf)
        val wall = (System.nanoTime() - w0) / 1e9
        println(f"group pass $p pool=$pool wall=$wall%.2f s, rows: " +
          walls.map { case (n, sec) => f"$n=$sec%.1f" }.mkString(" "))
      }
    }
    // contamination arm D: a full BATCH suite pass on the root session
    // (what Bench's pass does between the streaming group and the
    // isolated streaming re-measure) — the "batch residue" hypothesis.
    if (args.length > 3 && args(3) == "batch") {
      val streamingNames = Set("q41_stream_hourly", "q42_stream_sessionize",
        "q57_stream_dedup", "q64_stream_stream_join", "q101_stream_static_join",
        "q107_stream_session_window", "q122_stream_cdc_upsert",
        "q169_stream_hopping", "q309_stream_dedup_bounded",
        "q310_stream_transform_state", "q311_stream_outer_join",
        "q333_stream_fp_dedup", "q335_grec_stream_read", "q336_grec_stream_sink",
        "q319_stream_chained_agg", "q358_stream_crawl_incremental",
        "q359_stream_url_frontier")
      val t0 = System.nanoTime()
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot(q => streamingNames(q._1))
        .foreach { case (n, fn) =>
          try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          catch { case e: Throwable => println(s"contam $n: ${e.getMessage}") }
        }
      graft.util.Caches.clearAll(spark)
      println(f"batch pass done in ${(System.nanoTime() - t0) / 1e9}%.0f s, " +
        s"heap used ${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1048576} MB")
    }
    // contamination arm B: a batch burn-in (cache/uncache churn)
    if (burnin) {
      (1 to 10).foreach { _ =>
        val df = spark.read.parquet(s"$sfDir/lineitem.parquet").cache()
        df.count(); df.unpersist(blocking = false)
      }
    }
    def gcSettle(): Unit = { System.gc(); Thread.sleep(2000); System.gc() }
    gcSettle()
    names.foreach { name =>
      val s = spark.newSession()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(s, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"q":"$name","sec":$sec%.2f,"heap_mb":${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1048576}}""")
    }
    spark.stop()
  }
}
