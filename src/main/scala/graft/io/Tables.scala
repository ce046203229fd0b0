package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated synthetic star schema
  * (`TESTDATA.md`). Plain `spark.read.parquet` so Catalyst handles
  * predicate pushdown / column pruning / partition planning — the scan
  * equivalent of the reference's line-oriented text inputs
  * (SURVEY §2.1 S1/S2; reference: BigDataLab02/DataProcessing/task1_2.java:40-62).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects — read nanos as long (legacy conf),
    * exposed raw for streaming schemas. */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }

  /** events with `ts` normalized to a micros TIMESTAMP (floor of the
    * nanos value — matches engines that truncate ns→µs). */
  def events(s: SparkSession, d: String): DataFrame =
    eventsRaw(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
