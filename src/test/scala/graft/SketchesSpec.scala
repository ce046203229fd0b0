package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("union of per-shard sketches == one global sketch (mergeability)") {
    val ev = graft.io.Tables.events(spark, TestSession.sf)
      .select(col("event_type"), col("user_id"),
        (col("event_id") % 16).as("shard"))
    val merged = Sketches.estimate(Sketches.mergeSketches(
        Sketches.distinctSketch(ev, Seq("event_type", "shard"), "user_id"),
        Seq("event_type")))
      .select("event_type", "approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val global = Sketches.estimate(
        Sketches.distinctSketch(ev, Seq("event_type"), "user_id"))
      .select("event_type", "approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == global,
      "merging shard partials must equal the single-pass sketch")
  }

  test("estimates are within 5% of exact distinct counts") {
    val ev = graft.io.Tables.events(spark, TestSession.sf)
    val approx = Sketches.estimate(
        Sketches.distinctSketch(ev, Seq("event_type"), "user_id"))
      .select("event_type", "approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx $a vs exact $n")
    }
  }
}
