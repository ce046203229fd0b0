package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main for the triangle-kernel work (round 9):
  * times the co-purchase build and kernel variants cold in one JVM.
  * `sbt "runMain graft.TriLab <variant> [sfDir]"`. Not part of the
  * declared surface; kept for reproducibility of the round-9 numbers.
  */
object TriLab {
  def main(args: Array[String]): Unit = {
    val variant = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMED $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    lazy val edges = timed("copurchase-build") {
      val e = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey")
            && col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").cast("long").as("a"),
          col("y.l_partkey").cast("long").as("b"))
        .distinct().cache()
      e.count()
      e
    }

    variant match {
      case "current" =>
        timed("kernel-current") {
          graft.ops.Graph.triangleCounts(edges)
            .agg(sum(col("n_triangles"))).show()
        }
      case "q204" =>
        timed("q204-full") {
          SparkEntry.queries("q204_clustering_coef")(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
        timed("q204-second") {
          SparkEntry.queries("q204_clustering_coef")(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
      case "q109" =>
        timed("q109-full") {
          SparkEntry.queries("q109_triangles")(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
        timed("q109-second") {
          SparkEntry.queries("q109_triangles")(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
      case "q204x" =>
        // stage breakdown of the artifact READ path
        timed("  artifact-build(via q197)") {
          SparkEntry.queries("q197_kcore")(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
        val adj = timed("  artifact-read-count") {
          val a = spark.table("copurchase__root_testdata_sf0_1")
          a.count(); a
        }
        val m = timed("  edge-count") { adj.count() / 2 }
        val o = adj
          .filter(struct(col("deg_u"), col("u")) < struct(col("deg_v"), col("v")))
          .select(col("u").as("src"), col("v").as("dst"))
        timed("  adj-collect") {
          o.groupBy(col("src"))
            .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
            .collect().length
        }
        timed("  kernel-total") {
          graft.ops.Graph.triangleCountsOriented(o, m)
            .agg(sum(col("n_triangles"))).show()
        }
        timed("  q204-full-again") {
          SparkEntry.queries("q204_clustering_coef")(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
      case "q197" =>
        timed("q197-full") {
          SparkEntry.queries("q197_kcore")(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
        timed("q197-second") {
          SparkEntry.queries("q197_kcore")(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
      case "bcast" =>
        timed("kernel-bcast") {
          val und = edges
          val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
            .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          val keyed = und
            .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
            .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
          val o = timed("  orient+checkpoint") {
            keyed.select(
                when(struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b")),
                  struct(col("a").as("src"), col("b").as("dst")))
                  .otherwise(struct(col("b").as("src"), col("a").as("dst")))
                  .as("e"))
              .select(col("e.src").as("src"), col("e.dst").as("dst"))
              .localCheckpoint(true)
          }
          val adj = timed("  adj-build+cache") {
            val a = o.groupBy(col("src"))
              .agg(sort_array(collect_list(col("dst"))).as("nbrs")).cache()
            a.count()
            a
          }
          timed("  perEdge+agg") {
            val perEdge = o
              .join(broadcast(adj).select(col("src"), col("nbrs").as("na")), Seq("src"))
              .join(broadcast(adj).select(col("src").as("dst"), col("nbrs").as("nb")), Seq("dst"))
              .select(col("src"), col("dst"),
                array_intersect(col("na"), col("nb")).as("cw"))
              .where(size(col("cw")) > 0)
            val u = perEdge.select(col("src").as("node"),
              size(col("cw")).cast("long").as("c"))
            val v = perEdge.select(col("dst").as("node"),
              size(col("cw")).cast("long").as("c"))
            val w = perEdge.select(explode(col("cw")).as("node"), lit(1L).as("c"))
            u.unionAll(v).unionAll(w)
              .groupBy(col("node")).agg(sum(col("c")).as("n_triangles"))
              .agg(sum(col("n_triangles"))).show()
          }
        }
      case "wedgecount" =>
        // just measure the oriented wedge volume (drives the old shape)
        timed("wedge-volume") {
          val und = edges
          val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
            .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          val keyed = und
            .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
            .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
          val o = keyed.select(
              when(struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b")),
                struct(col("a").as("src"), col("b").as("dst")))
                .otherwise(struct(col("b").as("src"), col("a").as("dst")))
                .as("e"))
            .select(col("e.src").as("src"), col("e.dst").as("dst"))
          o.groupBy(col("src")).agg(count(lit(1)).as("d"))
            .agg(sum(col("d") * (col("d") - 1) / 2), max(col("d")), sum(col("d"))).show()
        }
      case other => sys.error(s"unknown variant $other")
    }
    spark.stop()
  }
}
