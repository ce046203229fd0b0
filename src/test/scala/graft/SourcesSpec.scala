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
}
