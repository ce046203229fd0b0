package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Pins `Tables.events` against physical-encoding drift of the
  * driver-owned events.parquet (TESTDATA.md declares the data
  * read-only, so its encoding is adversarial — it already drifted once,
  * int64-nanos → timestamp[us], silently redding 29 queries).
  *
  * Every plausible encoding must normalize to the SAME epoch-micros
  * values:
  *   - int64 epoch-nanos (what the original testdata stored, via
  *     `nanosAsLong`, and what a plain BIGINT column loads as)
  *   - timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ (what the
  *     refreshed testdata stores)
  *   - timestamp[us] isAdjustedToUTC=true → TIMESTAMP
  *   - timestamp[ns] (legacy physical NANOS — a checked-in pyarrow
  *     fixture, since Spark cannot write it)
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // ns values with sub-microsecond residue; micros = floor(ns / 1000)
  private val nsValues = Seq(1700000000123456789L, 1700000003999999999L,
    1700000007000000001L)
  private val usValues = nsValues.map(_ / 1000)

  private def tmpTableDir(): String = {
    val dir = Files.createTempDirectory("tsenc").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  private def loadedMicros(dir: String): Seq[Long] = {
    val df = graft.io.Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      "normalized ts must be a micros TIMESTAMP for every encoding")
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("int64 epoch-nanos ts normalizes to floored micros") {
    import spark.implicits._
    val dir = tmpTableDir()
    nsValues.zipWithIndex
      .map { case (ns, i) => (i.toLong, i.toLong, "click", 1.0, ns) }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) == usValues)
  }

  test("timestamp[us] NTZ ts (current testdata encoding) passes through") {
    import spark.implicits._
    val dir = tmpTableDir()
    nsValues.zipWithIndex
      .map { case (ns, i) => (i.toLong, i.toLong, "click", 1.0, ns / 1000) }
      .toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // session tz is UTC, so the NTZ wall-clock == the instant bit-for-bit
    assert(loadedMicros(dir) == usValues)
  }

  test("timestamp[us] UTC-adjusted ts passes through") {
    import spark.implicits._
    val dir = tmpTableDir()
    nsValues.zipWithIndex
      .map { case (ns, i) => (i.toLong, i.toLong, "click", 1.0, ns / 1000) }
      .toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) == usValues)
  }

  test("timestamp[ns] physical NANOS ts (pyarrow fixture) normalizes to floored micros") {
    val fixture = Paths.get("src/test/resources/tsenc/events_ns.parquet")
    assert(Files.exists(fixture), s"missing checked-in fixture $fixture")
    val dir = tmpTableDir()
    Files.createDirectories(Paths.get(s"$dir/events.parquet"))
    Files.copy(fixture, Paths.get(s"$dir/events.parquet/part-00000.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    assert(loadedMicros(dir) == usValues)
  }

  test("embeddings canonicalize to array<float> from either element encoding") {
    import spark.implicits._
    // values with float-truncation residue: 0.1 and 1/3 are not exact
    val vecs = Seq((1L, Seq(0.1, 1.0 / 3.0), 0), (2L, Seq(2.5, -7.25), 1))
    val dirD = tmpTableDir()
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dirD/embeddings.parquet")
    val dirF = tmpTableDir()
    vecs.map { case (id, v, l) => (id, v.map(_.toFloat), l) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dirF/embeddings.parquet")
    def loadVals(dir: String): Seq[(Long, Seq[Float])] = {
      val df = graft.io.Tables.embeddings(spark, dir)
      assert(df.schema("embedding").dataType ==
        ArrayType(FloatType, containsNull = true),
        "embedding must canonicalize to array<float>")
      df.select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq.sortBy(_._1)
    }
    assert(loadVals(dirD) == loadVals(dirF),
      "double-encoded embeddings must load as the same float values")
  }

  test("streaming source normalizes ts identically to the batch loader") {
    val sfDir = TestSession.sf
    val batch = graft.io.Tables.events(spark, sfDir)
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))), count(lit(1)))
      .first()
    val stream = graft.io.Tables.eventsStream(spark, sfDir)
    assert(stream.schema("ts").dataType == TimestampType)
    val name = "tsenc_stream_smoke"
    val q = stream
      .agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"), count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    val st = spark.table(name).first()
    assert(st.getLong(0) == batch.getLong(0) && st.getLong(1) == batch.getLong(1)
      && st.getLong(2) == batch.getLong(2),
      "streaming min/max/count over ts must equal the batch loader's")
  }
}
