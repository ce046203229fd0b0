package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the round-11 HOF→codegen vector-kernel
  * work: times the interpreted zip_with+aggregate folds against the
  * native kernels on a synthetic (rows × dim) workload where the
  * per-element cost dominates (the declared ANN queries at sf0.1 are
  * fixed-cost-bound: 2,000 vectors × 64 dims ≈ 2M element-ops, under
  * the run-to-run noise floor). Not part of the declared surface;
  * kept for reproducibility of the round-11 numbers.
  * `sbt "runMain graft.VecLab [rows] [dim] [cents]"`.
  */
object VecLab {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 200000
    val dim = if (args.length > 1) args(1).toInt else 64
    val nCent = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id % 7)").collect()

    // deterministic synthetic vectors (no Math.random — replayable)
    val base = spark.range(rows).select(col("id"),
      expr(s"transform(sequence(1, $dim), i -> " +
        "cast(pmod(id * 2654435761L + i * 40503, 1000) as double) / 1000.0)")
        .as("vec"))
      .localCheckpoint(true) // materialize input OUTSIDE the timed region
    val cents = (0 until nCent).map(c =>
      (0 until dim).map(i => ((c * 131 + i * 17) % 1000) / 1000.0))
    val csLit = typedlit(cents)

    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TIMED $label $s%.2f s"); s
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val exploded = base.select(col("id"), col("vec"), explode(csLit).as("c"))
    val hofD29 = aggregate(
      zip_with(col("vec"), col("c"), (x, y) =>
        round((x - y) * (x - y) * lit(1e9)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val kernD29 = graft.functions.VectorFunctions.sqDistScaled9(
      col("vec"), col("c"))

    // alternate, two rounds each, min-of-two reported
    var hof1 = timed("hof_d29_p1") { noop(exploded.select(hofD29.as("d"))) }
    var ker1 = timed("kernel_d29_p1") { noop(exploded.select(kernD29.as("d"))) }
    val hof2 = timed("hof_d29_p2") { noop(exploded.select(hofD29.as("d"))) }
    val ker2 = timed("kernel_d29_p2") { noop(exploded.select(kernD29.as("d"))) }
    println(f"MIN hof=${math.min(hof1, hof2)}%.2f s  " +
      f"kernel=${math.min(ker1, ker2)}%.2f s")

    // parity spot check (exact equality on every row)
    val bad = exploded.select(hofD29.as("h"), kernD29.as("k"))
      .filter(col("h") =!= col("k")).count()
    println(s"PARITY mismatches=$bad")
    spark.stop()
  }
}
