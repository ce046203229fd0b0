package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, TimestampNTZType, TimestampType}

import scala.util.control.NonFatal

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

  /** Normalize an events frame's `ts` column to ONE canonical type — a
    * micros-precision `TIMESTAMP` — whatever physical encoding the
    * (driver-owned, read-only) parquet currently uses. The encoding has
    * already drifted once across rounds (int64 epoch-nanos →
    * `timestamp[us]`), so the loader treats it as adversarial and
    * branches on the type that actually loaded:
    *
    *   - `LongType`         — epoch NANOS as int64 (either a plain
    *     BIGINT column or a legacy `TIMESTAMP(NANOS)` read under
    *     `nanosAsLong`) → `timestamp_micros(ts div 1000)`, flooring
    *     ns → µs exactly like engines that truncate.
    *   - `TimestampNTZType` — parquet `timestamp[us]` with
    *     isAdjustedToUTC=false (what the current testdata stores, and
    *     what Spark's NTZ inference surfaces) → cast to `TIMESTAMP`.
    *     Every entry point pins `spark.sql.session.timeZone=UTC`, so
    *     the cast reinterprets the wall-clock as a UTC instant and the
    *     epoch-micros value is preserved bit-for-bit.
    *   - `TimestampType`    — already a micros instant → pass through.
    *
    * Anything else fails loudly here, naming the loader — not 29
    * queries downstream (TablesSpec pins all accepted encodings).
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.$colName has unsupported encoding $other — expected " +
          "int64 epoch-nanos, timestamp[us] (NTZ or UTC), or timestamp[ns]")
    }

  /** events as stored on disk, `ts` un-normalized. A plain read first;
    * only if the footer uses the legacy `TIMESTAMP(NANOS)` physical
    * type — which Spark's parquet reader rejects at schema-conversion
    * time — fall back to `spark.sql.legacy.parquet.nanosAsLong`, which
    * surfaces `ts` as an epoch-nanos BIGINT for [[normalizeTs]] to
    * convert. The conf is only ever touched on that legacy branch. */
  def eventsRaw(s: SparkSession, d: String): DataFrame =
    try load(s, d, "events")
    catch {
      case NonFatal(e) if hasNanosType(e) =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        load(s, d, "events")
    }

  private def hasNanosType(e: Throwable): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("NANOS") || m.contains("nanosAsLong")
  }

  /** events with `ts` normalized to a micros TIMESTAMP — the contract
    * every batch consumer (and the DuckDB oracle) relies on. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(eventsRaw(s, d))

  /** Streaming source over the same event files with the identical ts
    * normalization. The readStream schema is derived from the batch
    * footer — never re-hardcoded — so batch and streaming can't
    * disagree about the physical encoding. */
  def eventsStream(s: SparkSession, d: String): DataFrame =
    normalizeTs(
      s.readStream.schema(eventsRaw(s, d).schema).parquet(s"$d/events*.parquet"))

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** Streaming source over the same document files (schema from the
    * batch reader) — the crawl-ingest shape for streaming dedup. */
  def documentsStream(s: SparkSession, d: String): DataFrame =
    s.readStream.schema(documents(s, d).schema)
      .parquet(s"$d/documents*.parquet")

  /** embeddings with the vector canonicalized to `array<float>` — the
    * type every ANN/quantization consumer (and their `Seq[Float]`
    * collect paths for O(k) model state) relies on. Same
    * drift-adversarial stance as [[normalizeTs]]: a driver
    * regeneration as `list<double>` must degrade to a cast, not crash
    * the whole similarity family (TablesSpec pins both encodings;
    * q136 is the oracle smoke). */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "embeddings")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _)  => df
      case ArrayType(DoubleType, _) =>
        df.withColumn("embedding", col("embedding").cast("array<float>"))
      case other => throw new IllegalArgumentException(
        s"embeddings.embedding has unsupported encoding $other — expected " +
          "array<float> or array<double>")
    }
  }
}
