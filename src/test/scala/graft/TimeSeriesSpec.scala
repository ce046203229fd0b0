package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.ops.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("a reserved keyCol is rejected upfront; other role names are free") {
    val df = Seq((1L, ts("2026-01-01 10:30:00"), 1.0, 5L)).toDF("k", "t", "v", "id")
    val e1 = intercept[IllegalArgumentException] {
      TimeSeries.resampleHourlyLocf(df.withColumnRenamed("k", "hour"), "hour", "t", "v", "id")
    }
    assert(e1.getMessage.contains("hour"))
    val e2 = intercept[IllegalArgumentException] {
      TimeSeries.resampleHourlyLocf(df.withColumnRenamed("k", "_ots"), "_ots", "t", "v", "id")
    }
    assert(e2.getMessage.contains("_ots"))
    // a VALUE column named "value" (like the events table) is fine
    val ok = TimeSeries.resampleHourlyLocf(
      df.withColumnRenamed("v", "value"), "k", "t", "value", "id")
    assert(ok.columns.toSeq == Seq("k", "hour", "value") && ok.count() == 1)
  }

  test("hourly LOCF: grid spans per-key range, values carry forward, ties break on tieCol") {
    val df = Seq(
      // key 1: obs at 10:30 (v=1), 10:45 tie pair (ids 5/6 → 6 wins, v=3), 13:10 (v=9)
      (1L, ts("2026-01-01 10:30:00"), 1.0, 5L),
      (1L, ts("2026-01-01 10:45:00"), 2.0, 5L),
      (1L, ts("2026-01-01 10:45:00"), 3.0, 6L),
      (1L, ts("2026-01-01 13:10:00"), 9.0, 7L),
      // key 2: single observation exactly on the hour
      (2L, ts("2026-01-01 05:00:00"), 4.0, 8L))
      .toDF("k", "t", "v", "id")
    val got = TimeSeries.resampleHourlyLocf(df, "k", "t", "v", "id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(got == Set(
      (1L, "2026-01-01 10:00:00.0", None),       // grid start precedes first obs
      (1L, "2026-01-01 11:00:00.0", Some(3.0)),  // tie resolved to id 6
      (1L, "2026-01-01 12:00:00.0", Some(3.0)),  // carried forward
      (1L, "2026-01-01 13:00:00.0", Some(3.0)),  // 13:10 obs is after the 13:00 instant
      (2L, "2026-01-01 05:00:00.0", Some(4.0)))) // on-the-hour obs is inclusive
  }

  test("scd2History: runs collapse, intervals chain half-open, last is current") {
    val ev = Seq(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), // same-state run collapses
      (1L, "B", 30L, 3L), (1L, "A", 40L, 4L), // A again → NEW interval
      (2L, "X", 5L, 5L)
    ).toDF("user_id", "state", "us", "event_id")
    val got = graft.ops.TimeSeries.scd2History(ev, "user_id", "state",
        "us", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq == Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "X", 5L, None, true)))
  }

  test("scd2History: equal-timestamp changes order by id") {
    val ev = Seq((1L, "A", 10L, 2L), (1L, "B", 10L, 1L))
      .toDF("user_id", "state", "us", "event_id")
    val got = graft.ops.TimeSeries.scd2History(ev, "user_id", "state",
        "us", "event_id")
      .collect().map(r => (r.getString(1), r.getBoolean(4))).sortBy(_._1)
    // B (id 1) comes first, A (id 2) is current
    assert(got.toSeq == Seq(("A", true), ("B", false)))
  }
}
