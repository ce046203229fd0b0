package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** The `grec` binary format + its DataSource V2 connector: round-trip
  * fidelity, schema inference from the header, column pruning reaching
  * the scan (and the byte decoder), multi-file partition planning. */
class GraftRecSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import graft.io.GraftRec

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("grec").toString + "/t"

  test("round-trip: long/double/string rows survive write → DSv2 read") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq(
      (1L, 1.5, "alpha"), (2L, -2.25, ""), (3L, 0.0, "βπ — utf8"),
      (Long.MinValue, Double.MaxValue, "x" * 1000))
      .toDF("id", "v", "s")
    GraftRec.write(df, dir)
    val back = spark.read.format("graft.io.GraftRecSource").load(dir)
    // the header does not record nullability — compare names + types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("multi-file: one partition per file, all rows read") {
    import spark.implicits._
    val dir = tmp()
    val df = (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(7)
    GraftRec.write(df, dir)
    val back = spark.read.format("graft.io.GraftRecSource").load(dir)
    assert(back.rdd.getNumPartitions == GraftRec.listFiles(dir).length)
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).head().getLong(0) == 500500L)
  }

  test("column pruning reaches the scan: projecting one column narrows " +
    "the BatchScan output to exactly that column") {
    import spark.implicits._
    val dir = tmp()
    GraftRec.write(Seq((1L, 9.0, "a"), (2L, 8.0, "b")).toDF("id", "v", "s"),
      dir)
    val q = spark.read.format("graft.io.GraftRecSource").load(dir)
      .select(col("v"))
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.output.map(_.name) == Seq("v"))
    assert(q.as[Double].collect().sorted.toSeq == Seq(8.0, 9.0))
  }

  test("pruned strings are skipped correctly: values around them decode") {
    import spark.implicits._
    val dir = tmp()
    // string column in the MIDDLE so skipping its length prefix is on
    // the path of every subsequent read
    GraftRec.write(Seq((10L, "long-middle-string-" * 50, 1.25),
        (20L, "", -3.5)).toDF("a", "mid", "b"), dir)
    val back = spark.read.format("graft.io.GraftRecSource").load(dir)
      .select(col("a"), col("b"))
    assert(back.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((10L, 1.25), (20L, -3.5)))
  }

  test("unsupported column types are rejected at write time") {
    import spark.implicits._
    val dir = tmp()
    val bad = Seq((1, "x")).toDF("i", "s") // Int, not Long
    intercept[IllegalArgumentException](GraftRec.write(bad, dir))
  }

  // ---- DSv2 committed write path (round 9) --------------------------

  test("committed write: DSv2 save → read round-trips, no staging residue") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq((1L, 1.5, "a"), (2L, 2.5, "βδ"), (3L, -0.25, ""))
      .toDF("id", "v", "s")
    df.write.format("graft.io.GraftRecSource").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles()
    assert(files.forall(f => !f.getName.endsWith(GraftRec.StagingSuffix)),
      "staged files must not survive a successful commit")
    val back = spark.read.format("graft.io.GraftRecSource").load(dir)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("committed overwrite: the stale generation is fully replaced") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("id", "s")
      .write.format("graft.io.GraftRecSource").mode("append").save(dir)
    Seq((10L, "new")).toDF("id", "s")
      .write.format("graft.io.GraftRecSource").mode("overwrite").save(dir)
    val back = spark.read.format("graft.io.GraftRecSource").load(dir)
    assert(back.select(col("id"), col("s")).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))) == Seq((10L, "new")))
  }

  test("null values are rejected loudly on both write paths") {
    import spark.implicits._
    val dir = tmp()
    val withNull = Seq((1L, Some("x")), (2L, None))
      .toDF("id", "s").select(col("id"), col("s"))
    val e = intercept[Exception] {
      withNull.write.format("graft.io.GraftRecSource").mode("append").save(dir)
    }
    // executor-side IllegalArgumentException surfaces wrapped in the
    // job failure — assert the message carried through
    assert(e.getMessage != null)
    intercept[Exception](GraftRec.write(withNull, tmp()))
    ()
  }

  test("external schema mismatching the file header fails fast") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "x")).toDF("id", "s")
      .write.format("graft.io.GraftRecSource").mode("append").save(dir)
    // same names, swapped order → positional decode would be garbage
    val e = intercept[Exception] {
      spark.read.format("graft.io.GraftRecSource")
        .schema("s STRING, id BIGINT").load(dir).collect()
    }
    assert(e.getMessage != null)
    ()
  }

  test("write target colliding with a regular file is a clear error") {
    val f = java.nio.file.Files.createTempFile("grec", ".notadir")
    import spark.implicits._
    intercept[Exception] {
      Seq((1L, "x")).toDF("id", "s")
        .write.format("graft.io.GraftRecSource").mode("append")
        .save(f.toString)
    }
    ()
  }

  // ------------------------------------------------------------------
  // Filter pushdown (q327) — the second DSv2 pushdown axis.
  // ------------------------------------------------------------------

  test("filter pushdown: supported predicates reach the scan, the " +
    "residual stays post-scan, results are exact") {
    import spark.implicits._
    val dir = tmp()
    GraftRec.write((1L to 40L).map(i => (i, i * 1.5, s"s${i % 4}"))
      .toDF("id", "v", "s"), dir)
    val q = spark.read.format("graft.io.GraftRecSource").load(dir)
      .where(col("s") === "s1" && col("v") >= 9.0 && col("id") % 3 === 0)
      .select(col("id"))
    // the scan's description must carry the two pushable predicates
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    val desc = scans.head.scan.description()
    assert(desc.contains("EqualTo(s,s1)") &&
      desc.contains("GreaterThanOrEqual(v,9.0)"), desc)
    assert(!desc.contains("%"), s"modulo must not be pushed: $desc")
    // and the result equals the brute-force evaluation
    val expect = (1L to 40L)
      .filter(i => i % 4 == 1 && i * 1.5 >= 9.0 && i % 3 == 0)
    assert(q.as[Long].collect().sorted.toSeq == expect)
  }

  test("filter pushdown: a filter on a PRUNED column decodes it " +
    "transiently and still filters correctly") {
    import spark.implicits._
    val dir = tmp()
    GraftRec.write(Seq((1L, "keep"), (2L, "drop"), (3L, "keep"))
      .toDF("id", "s"), dir)
    val q = spark.read.format("graft.io.GraftRecSource").load(dir)
      .where(col("s") === "keep").select(col("id"))
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    // output pruned to id only, yet the string filter applies
    assert(scans.head.output.map(_.name) == Seq("id"))
    assert(q.as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("aggregate pushdown: grouped COUNT/MIN/MAX/SUM(long) reach the " +
    "scan, which emits per-file partials, and results are exact") {
    import spark.implicits._
    val dir = tmp()
    // two files → the final aggregate must MERGE partials correctly
    GraftRec.write((1L to 30L).map(i => (i, i * 2.0, s"g${i % 3}"))
      .toDF("id", "v", "g").repartition(2), dir)
    val q = spark.read.format("graft.io.GraftRecSource").load(dir)
      .where(col("v") >= 10.0)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"), sum(col("id")).as("sm"))
    // AQE wraps the agg plan; the scan description still prints
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("PushedAggregates:"), desc)
    assert(desc.contains("min(id)") && desc.contains("max(id)") &&
      desc.contains("sum(id)"), desc)
    assert(desc.contains("GroupBy: [g]"), desc)
    // brute-force expectation
    val rows = (1L to 30L).filter(_ * 2.0 >= 10.0)
    val expect = rows.groupBy(i => s"g${i % 3}").map { case (g, is) =>
      (g, is.size.toLong, is.min, is.max, is.sum)
    }.toSet
    assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet == expect)
  }

  test("aggregate pushdown declines double sums and expression inputs") {
    import spark.implicits._
    val dir = tmp()
    GraftRec.write((1L to 9L).map(i => (i, i * 1.1)).toDF("id", "v"), dir)
    // sum(double) must NOT push (accumulation-order nondeterminism);
    // the whole aggregation stays in Spark and still evaluates fine
    val q = spark.read.format("graft.io.GraftRecSource").load(dir)
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
    val desc = q.queryExecution.executedPlan.toString
    assert(!desc.contains("PushedAggregates:"), desc)
    assert(q.collect().head.getLong(1) == 9L)
  }

  test("limit pushdown: the reader stops after k; filters compose as " +
    "find-first-k") {
    import spark.implicits._
    val dir = tmp()
    GraftRec.write((1L to 100L).map(i => (i, s"g${i % 2}"))
      .toDF("id", "g").coalesce(1), dir)
    val q = spark.read.format("graft.io.GraftRecSource").load(dir).limit(3)
    assert(q.queryExecution.executedPlan.toString.contains("PushedLimit: 3"))
    // single sorted file → first 3 records are ids 1..3
    assert(q.select(col("id")).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // with a pushed filter: first k SURVIVORS (find-first-k early exit)
    val qf = spark.read.format("graft.io.GraftRecSource").load(dir)
      .where(col("g") === "g0").limit(2).select(col("id"))
    assert(qf.as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("statistics: exact metadata-only row count for fixed-width " +
    "schemas, size-only otherwise") {
    import spark.implicits._
    import graft.io.GraftRecScanBuilder
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    val dirF = tmp()
    GraftRec.write((1L to 37L).map(i => (i, i * 0.5)).toDF("id", "v")
      .repartition(3), dirF)
    val schemaF = spark.read.format("graft.io.GraftRecSource").load(dirF)
      .schema
    val statsF = new GraftRecScanBuilder(dirF, schemaF).build()
      .asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(statsF.numRows().getAsLong == 37L, "fixed-width rows exact")
    assert(statsF.sizeInBytes().getAsLong ==
      GraftRec.listFiles(dirF).map(_.length()).sum)
    // a string column makes records variable-width → numRows absent
    val dirS = tmp()
    GraftRec.write(Seq((1L, "ab"), (2L, "cdef")).toDF("id", "s"), dirS)
    val schemaS = spark.read.format("graft.io.GraftRecSource").load(dirS)
      .schema
    val statsS = new GraftRecScanBuilder(dirS, schemaS).build()
      .asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(!statsS.numRows().isPresent)
    assert(statsS.sizeInBytes().getAsLong > 0L)
  }

  test("streaming read: micro-batches consume exactly the NEW committed " +
    "files, regardless of where their UUID names sort") {
    import spark.implicits._
    val dir = tmp()
    // generation 1 through the committed DSv2 writer
    (1L to 10L).map(i => (i, s"g${i % 2}")).toDF("id", "g").coalesce(1)
      .write.format("graft.io.GraftRecSource").mode("append").save(dir)
    val name = s"grecstream${System.nanoTime()}"
    val q = spark.readStream.format("graft.io.GraftRecSource").load(dir)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory")
      .queryName(name).start()
    q.processAllAvailable()
    val first = spark.table(name).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first == Map("g0" -> 5L, "g1" -> 5L))
    // generation 2 lands mid-stream (fresh UUID names — may sort
    // before generation 1's; the set-valued offset must still see it)
    (11L to 16L).map(i => (i, "g0")).toDF("id", "g").coalesce(1)
      .write.format("graft.io.GraftRecSource").mode("append").save(dir)
    q.processAllAvailable()
    q.stop()
    val second = spark.table(name).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(second == Map("g0" -> 11L, "g1" -> 5L),
      s"incremental batch not consumed exactly once: $second")
  }

  test("streaming sink: per-epoch two-phase commits land every batch, " +
    "no staging residue, epochs visible in file names") {
    import spark.implicits._
    val srcDir = tmp(); val dstDir = tmp(); val cp = tmp() + "/cp"
    (1L to 6L).map(i => (i, s"g${i % 2}")).toDF("id", "g").coalesce(1)
      .write.format("graft.io.GraftRecSource").mode("append").save(srcDir)
    // grec stream source → grec stream sink, end to end
    val q = spark.readStream.format("graft.io.GraftRecSource").load(srcDir)
      .writeStream.format("graft.io.GraftRecSource")
      .option("path", dstDir).option("checkpointLocation", cp)
      .outputMode("append").start()
    q.processAllAvailable()
    (7L to 9L).map(i => (i, "g1")).toDF("id", "g").coalesce(1)
      .write.format("graft.io.GraftRecSource").mode("append").save(srcDir)
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format("graft.io.GraftRecSource").load(dstDir)
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(back == (1L to 9L), s"lost or duplicated epoch rows: $back")
    val files = new java.io.File(dstDir).listFiles().map(_.getName)
    assert(!files.exists(_.endsWith(".staging")), "staged residue")
    // both epochs' committed files carry their epoch tag
    assert(files.exists(_.startsWith("part-e0-")) &&
      files.exists(_.startsWith("part-e1-")), files.toSeq.toString)
  }

  test("streaming offset JSON round-trips (incl. quoting)") {
    import graft.io.{GraftRecMicroBatchStream, GraftRecOffset}
    val ms = new GraftRecMicroBatchStream("/nonexistent",
      new org.apache.spark.sql.types.StructType(),
      new org.apache.spark.sql.types.StructType(), Array.empty)
    val off = GraftRecOffset(Seq("part-a.grec", "we\"ird\\name.grec"))
    val back = ms.deserializeOffset(off.json())
    assert(back == off, s"${off.json()} -> $back")
    assert(ms.deserializeOffset(GraftRecOffset(Nil).json()) ==
      GraftRecOffset(Nil))
  }

  test("filter pushdown: long range + equality combine; empty result ok") {
    import spark.implicits._
    val dir = tmp()
    GraftRec.write((1L to 10L).map(i => (i, s"g${i % 2}"))
      .toDF("id", "g"), dir)
    val df = spark.read.format("graft.io.GraftRecSource").load(dir)
    assert(df.where(col("id") > 3L && col("id") <= 7L && col("g") === "g0")
      .select(col("id")).as[Long].collect().sorted.toSeq == Seq(4L, 6L))
    assert(df.where(col("id") > 100L).count() == 0L)
  }
}
