package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth (SURVEY S2/S4): CSV and JSON round-trips
  * with explicit schemas — the reference's line-oriented text tables
  * generalized to every format Spark ships.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  lazy val docs = graft.io.Tables.documents(spark, TestSession.sf)
    .select("doc_id", "lang", "source", "n_chars")

  test("csv round-trip with explicit schema preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("json lines round-trip preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("orc round-trip preserves data (columnar alternative to parquet)") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    // ORC scans get the same pushdown treatment as parquet
    val plan = back.filter(col("n_chars") > 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"), plan)
  }

  test("tsv text sink re-parses positionally (reference S2 shape)") {
    val dir = java.nio.file.Files.createTempDirectory("tsv").toString
    graft.io.Sinks.writeTsv(docs.select("doc_id", "lang"), dir, "docs.mtx")
    val back = spark.read.option("sep", "\t").csv(s"$dir/docs.mtx")
      .select(col("_c0").cast("long").as("doc_id"), col("_c1").as("lang"))
    val orig = docs.select("doc_id", "lang")
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
  }

  test("parquet footer report: multi-row-group stats, nulls, and the " +
    "per-file rollup equal the data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pqlayout").toString
    // small page/block sizes force MULTIPLE row groups in one file
    val rows = (1L to 50000L).map(i =>
      (i, if (i % 7 == 0) None else Some(i * 3 % 1000)))
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .option("parquet.page.size", 8 * 1024)
      .parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val rep = graft.io.ParquetLayout.report(spark, Seq(f), Seq("k", "v"))
    val nGroups = rep.filter(col("column_name") === "k")
      .select(col("row_group_id")).distinct().count()
    assert(nGroups > 1, s"expected multiple row groups, got $nGroups")
    val roll = rep.groupBy(col("column_name"))
      .agg(sum(col("n_values")).as("nv"), sum(col("null_count")).as("nc"),
        min(col("min_v")).as("mn"), max(col("max_v")).as("mx"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(roll("k") == ((50000L, 0L, 1L, 50000L)))
    val nNull = rows.count(_._2.isEmpty).toLong
    val vs = rows.flatMap(_._2)
    assert(roll("v") == ((50000L, nNull, vs.min, vs.max)))
  }
}
