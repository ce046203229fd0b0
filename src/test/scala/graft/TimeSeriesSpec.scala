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

  test("hourly LOCF: a key whose span exceeds maxSpanHours fails loudly " +
    "instead of fanning out; a compliant cap passes unchanged") {
    val df = Seq(
      (1L, ts("2026-01-01 00:00:00"), 1.0, 1L),
      (1L, ts("2026-01-03 00:00:00"), 2.0, 2L)) // span = 48 hours
      .toDF("k", "t", "v", "id")
    val e = intercept[Exception] {
      TimeSeries.resampleHourlyLocf(df, "k", "t", "v", "id",
        maxSpanHours = 10L).collect()
    }
    assert(e.getMessage.contains("maxSpanHours") ||
      Option(e.getCause).exists(_.getMessage.contains("maxSpanHours")))
    assert(TimeSeries.resampleHourlyLocf(df, "k", "t", "v", "id",
      maxSpanHours = 48L).count() == 49L)
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

  test("twap: holding time weights the mean; single-event keys emit nothing") {
    val ev = Seq(
      // key 1: value 100 held 90 µs, then 200 held 10 µs → twap 110
      (1L, 0L, 1L, 100L), (1L, 90L, 2L, 200L), (1L, 100L, 3L, 999L),
      // key 2: one event — zero span
      (2L, 50L, 4L, 777L))
      .toDF("k", "us", "id", "cents")
    val got = TimeSeries.twap(ev, "k", "us", "cents", "id", unitDiv = 1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))).toMap
    assert(got.keySet == Set(1L))
    assert(got(1L) == ((2L, 100L, "11000", 110.0)),
      "(100·90 + 200·10) / 100 = 110; the last value carries no interval")
  }

  test("ewmaBounded: hand-computed α=½ weights, renormalized leading edge") {
    val ev = Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 400L))
      .toDF("k", "seq", "x")
    val got = TimeSeries.ewmaBounded(ev, "k", Seq("seq"), "x", w = 2)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    // w=2: weights (1, 2); den = 4 − 2^(2−m)
    assert(got(1L) == ((200L, 2L)), "single row: 100·2 / 2 = 100")
    assert(got(2L) == ((500L, 3L)), "(100·1 + 200·2) / 3")
    assert(got(3L) == ((1000L, 3L)), "window slides: (200·1 + 400·2) / 3")
  }

  test("ewmaBounded: per-key isolation and repartition invariance") {
    val ev = (1L to 100L).map(i => (i % 4, i, i * 7 % 50)).toDF("k", "seq", "x")
    val a = TimeSeries.ewmaBounded(ev, "k", Seq("seq"), "x", w = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    val b = TimeSeries.ewmaBounded(ev.repartition(11), "k", Seq("seq"), "x", w = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    assert(a.toSeq == b.toSeq)
    // first row of every key is its own value times 2^19 over 2^20−2^19
    val first = a.groupBy(_._1).map { case (_, rs) => rs.minBy(_._2) }
    first.foreach { case (k, seq, num) =>
      assert(num == (seq * 7 % 50) * (1L << 19), s"key $k leading edge") }
  }

  test("intervalCoverage: overlap merges, touching merges, gap splits") {
    val iv = Seq(
      ("a", 1L, 5L, 1L), ("a", 3L, 7L, 2L),   // overlap → island 1
      ("a", 7L, 9L, 3L),                       // touches [.,7) → island 1
      ("a", 20L, 25L, 4L),                     // gap → island 2
      ("b", 2L, 4L, 5L)).toDF("k", "s", "e", "t")
    val got = TimeSeries.intervalCoverage(iv, "k", "s", "e", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("a", 1L, 1L, 9L, 3L), ("a", 2L, 20L, 25L, 1L),
      ("b", 1L, 2L, 4L, 1L)))
  }

  test("intervalCoverage: contained interval never extends its island") {
    val iv = Seq(("k", 1L, 10L, 1L), ("k", 2L, 3L, 2L), ("k", 11L, 12L, 3L))
      .toDF("k", "s", "e", "t")
    val got = TimeSeries.intervalCoverage(iv, "k", "s", "e", "t")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 10L), (2L, 11L, 12L)))
  }

  test("cusumChangePoint: planted level shift found at the shift point") {
    // 10 values of 100 then 10 of 200: best cut at i = 10
    val rows = ((1L to 10L).map(i => ("k", i, 100L)) ++
      (11L to 20L).map(i => ("k", i, 200L))).toDF("k", "seq", "v")
    val r = TimeSeries.cusumChangePoint(rows, "k", Seq("seq"), "v")
      .collect().head
    assert(r.getLong(1) == 20L && r.getLong(2) == 10L)
    // D_10 = |20·1000 − 10·3000| = 10000; s_left and s_total exact
    assert(r.getLong(3) == 10000L && r.getLong(4) == 1000L
      && r.getLong(5) == 3000L)
  }

  test("cusumChangePoint: constant series → dmax 0, earliest cut wins ties") {
    val rows = (1L to 5L).map(i => ("k", i, 7L)).toDF("k", "seq", "v")
    val r = TimeSeries.cusumChangePoint(rows, "k", Seq("seq"), "v")
      .collect().head
    assert(r.getLong(2) == 1L && r.getLong(3) == 0L)
  }

  test("m4Downsample: first/last by (us, tie), min/max by value") {
    val rows = Seq(
      ("a", 1L, 1L, 5L), ("a", 2L, 2L, 9L), ("a", 3L, 3L, 1L),
      ("a", 9L, 4L, 9L), ("a", 12L, 5L, 7L),
      // exact ts tie inside one bucket: tie column decides first/last
      ("b", 4L, 2L, 30L), ("b", 4L, 1L, 20L))
      .toDF("k", "us", "tie", "v")
    val got = TimeSeries.m4Downsample(rows, "k", "us", "tie", "v", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("a", 0L, 4L, 5L, 9L, 1L, 9L), // first=5, last=9 (us 9), min=1, max=9
      ("a", 1L, 1L, 7L, 7L, 7L, 7L), // singleton bucket: all four equal
      ("b", 0L, 2L, 20L, 30L, 20L, 30L))) // tie 1 first, tie 2 last
  }

  test("m4Downsample: partition-invariant (mergeable partial aggregate)") {
    val rows = (1L to 200L).map(i => ("k", i * 13L % 97L, i, i * 7L % 31L))
      .toDF("k", "us", "tie", "v")
    val a = TimeSeries.m4Downsample(rows, "k", "us", "tie", "v", 10L)
      .collect().toSeq
    val b = TimeSeries.m4Downsample(rows.repartition(17), "k", "us", "tie",
      "v", 10L).collect().toSeq
    assert(a == b)
  }

  test("acf: planted period-3 series peaks at lag 3, flat series is NULL, partition-invariant") {
    import org.apache.spark.sql.functions._
    // key p: counts cycle 5,1,1 per hour (strong period 3); key f:
    // constant 2/hour (zero variance after centering → acf NULL)
    val rows = (0 until 30).flatMap { h =>
      val base = s"2026-01-01 ${"%02d".format(h % 24)}:00:00"
      val day = 1 + h / 24
      val t = ts(s"2026-01-0$day ${"%02d".format(h % 24)}:10:00")
      val np = if (h % 3 == 0) 5 else 1
      (0 until np).map(i => ("p", t)) ++ Seq.fill(2)(("f", t))
    }
    val df = rows.toDF("k", "t")
    val out = TimeSeries.acf(df, "k", "t", maxLag = 6)
      .orderBy(col("k"), col("lag")).collect()
    val p = out.filter(_.getString(0) == "p")
      .map(r => r.getAs[Long]("lag") -> r.getAs[Any]("acf9")).toMap
    assert(p(3L).asInstanceOf[Double] > 0.5, s"period-3 peak: ${p(3L)}")
    assert(p(1L).asInstanceOf[Double] < p(3L).asInstanceOf[Double])
    val f = out.filter(_.getString(0) == "f")
    assert(f.forall(_.isNullAt(f.head.fieldIndex("acf9"))),
      "zero-variance series must yield NULL acf")
    assert(f.forall(_.getAs[Long]("n") == 30L))
    val out2 = TimeSeries.acf(df.repartition(7), "k", "t", maxLag = 6)
      .orderBy(col("k"), col("lag")).collect()
    assert(out.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq,
      "integer-moment acf must be partition-invariant")
  }

  // ------------------------------------------------------------------
  // holtSmooth (q332) — the exact Holt recurrence.
  // ------------------------------------------------------------------

  private def dayEvents(k: String, perDay: Seq[Int]) =
    perDay.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(j =>
        (k, Timestamp.valueOf(f"2024-01-${d + 1}%02d 0${j % 9}:00:00")))
    }

  test("holtSmooth: constant series converges to the level, trend ~ 0") {
    import org.apache.spark.sql.functions._
    val df = dayEvents("a", Seq.fill(20)(8)).toDF("k", "t")
    val r = TimeSeries.holtSmooth(df, "k", "t").collect().head
    assert(r.getLong(1) == 20L)
    assert(r.getLong(2) == 8000000L, "level must equal the constant")
    assert(math.abs(r.getLong(3)) <= 1L, "trend must vanish")
    assert(r.getLong(7) == 0L, "one-step error on a constant is 0")
  }

  test("holtSmooth: a linear ramp yields a positive trend and forecasts " +
    "that extrapolate") {
    import org.apache.spark.sql.functions._
    val df = dayEvents("a", (1 to 25).map(d => 2 * d)).toDF("k", "t")
    val r = TimeSeries.holtSmooth(df, "k", "t").collect().head
    val level = r.getLong(2); val trend = r.getLong(3)
    assert(trend > 0L, "ramp must produce a positive trend")
    assert(r.getLong(4) == level + trend &&
      r.getLong(6) == level + 3 * trend, "linear forecast shape")
    // the learned trend lets Holt TRACK a ramp (unlike a plain EWMA,
    // which would lag it): level within 2% of the last observation
    assert(math.abs(level - 50000000L) < 1000000L, level.toString)
    // and the trend approaches the true slope 2e6/day
    assert(math.abs(trend - 2000000L) < 400000L, trend.toString)
  }

  test("holtSmooth: hand-traced first two steps (exact truncation)") {
    import org.apache.spark.sql.functions._
    // days: 4, 8 → l0=4e6, b0=0; pred=4e6; l1=(8e6+3*4e6)/4=5e6;
    // b1=(5e6-4e6+0)/5=2e5; sae=|8e6-4e6|=4e6
    val df = dayEvents("a", Seq(4, 8)).toDF("k", "t")
    val r = TimeSeries.holtSmooth(df, "k", "t").collect().head
    assert(r.getLong(2) == 5000000L && r.getLong(3) == 200000L &&
      r.getLong(7) == 4000000L, r.toString)
  }

  test("holtSmooth: single-day keys and repartition invariance") {
    import org.apache.spark.sql.functions._
    val df = (dayEvents("solo", Seq(5)) ++ dayEvents("b", Seq(1, 9, 3)))
      .toDF("k", "t")
    val a = TimeSeries.holtSmooth(df, "k", "t").orderBy("k").collect()
    val b = TimeSeries.holtSmooth(df.repartition(5), "k", "t")
      .orderBy("k").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val solo = a.find(_.getString(0) == "solo").get
    assert(solo.getLong(1) == 1L && solo.getLong(2) == 5000000L &&
      solo.getLong(3) == 0L && solo.getLong(7) == 0L)
  }

  // ------------------------------------------------------------------
  // holtWinters (q339) — Holt + additive weekly seasonality.
  // ------------------------------------------------------------------
  // output: k, n_days(1), level6(2), trend6(3), s0..s6(4..10),
  //         forecast_1..3(11..13), sae6(14)

  /** [[dayEvents]] is capped at 31 days by its Jan-only formatting;
    * seasonal tests need ≥6 weeks, so this one walks real dates. */
  private def hwDayEvents(k: String, perDay: Seq[Int]) =
    perDay.zipWithIndex.flatMap { case (n, d) =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      (0 until n).map(j =>
        (k, Timestamp.valueOf(s"$day 0${j % 9}:00:00")))
    }

  /** Plain-Scala mirror of the exact recurrence; `eds` are the
    * calendar epoch-days anchoring the seasonal slots. */
  private def hwRef(eds: Seq[Long], ys: Seq[Long])
      : (Long, Long, Array[Long], Seq[Long], Long) = {
    val S = 1000000L
    val s = new Array[Long](7)
    var l = ys.head * S; var b = 0L; var sae = 0L
    for (t <- 1 until ys.length) {
      val idx = (eds(t) % 7).toInt
      sae += math.abs(ys(t) * S - (l + b + s(idx)))
      val ln = (ys(t) * S - s(idx) + 3L * (l + b)) / 4L
      b = ((ln - l) + 4L * b) / 5L
      s(idx) = ((ys(t) * S - ln) + 2L * s(idx)) / 3L
      l = ln
    }
    val lastEd = eds(ys.length - 1)
    (l, b, s, (1 to 3).map(h => l + h * b + s(((lastEd + h) % 7).toInt)), sae)
  }

  /** Epoch days for `n` consecutive days from 2024-01-01 (= 19723). */
  private def hwEds(n: Int): Seq[Long] = (0 until n).map(19723L + _)

  test("holtWinters: constant series — level exact, trend and season 0") {
    val df = dayEvents("a", Seq.fill(21)(6)).toDF("k", "t")
    val r = TimeSeries.holtWinters(df, "k", "t").collect().head
    assert(r.getLong(1) == 21L && r.getLong(2) == 6000000L)
    assert(r.getLong(3) == 0L && r.getLong(14) == 0L)
    assert((4 to 10).forall(i => r.getLong(i) == 0L), "no spurious season")
  }

  test("holtWinters: planted weekly cycle — seasonal states split high " +
    "and low days with the right signs, forecasts carry the cycle") {
    // 6 full weeks of a period-7 pattern: day-of-cycle 0 spikes to 30,
    // the rest sit at 10 — s must go positive exactly on the spike's
    // CALENDAR slot (epoch-day 19723 % 7 = 4)
    val pattern = Seq(30, 10, 10, 10, 10, 10, 10)
    val ys = Seq.fill(6)(pattern).flatten
    val df = hwDayEvents("a", ys).toDF("k", "t")
    val r = TimeSeries.holtWinters(df, "k", "t").collect().head
    val (l, b, s, fc, sae) = hwRef(hwEds(ys.length), ys.map(_.toLong))
    assert(r.getLong(2) == l && r.getLong(3) == b && r.getLong(14) == sae)
    (0 to 6).foreach(i => assert(r.getLong(4 + i) == s(i), s"s$i"))
    assert((11 to 13).map(r.getLong) == fc)
    val spike = (19723L % 7).toInt // the spike day's calendar slot
    assert(s(spike) > 10000000L, s"spike season ${s(spike)}")
    assert((0 to 6).filter(_ != spike).forall(i => s(i) < s(spike) / 4),
      s.mkString(","))
    // day 42 is again a spike day: its slot is (19723+42)%7 == spike,
    // reached at h = 1 → forecast_1 carries the spike
    assert(r.getLong(11) > r.getLong(12) + 10000000L)
  }

  test("holtWinters: a MISSING day does not rotate later seasonal slots " +
    "(calendar anchoring)") {
    // same weekly spike, but one flat mid-week day has zero events and
    // is absent from the panel — the spike slot must stay put
    val pattern = Seq(30, 10, 10, 10, 10, 10, 10)
    val full = Seq.fill(6)(pattern).flatten
    val dropIdx = 10 // a flat day in week 2
    val eds = hwEds(full.length).zipWithIndex.filter(_._2 != dropIdx).map(_._1)
    val ys = full.zipWithIndex.filter(_._2 != dropIdx).map(_._1)
    val rows = eds.zip(ys).flatMap { case (ed, n) =>
      val day = java.time.LocalDate.ofEpochDay(ed)
      (0 until n).map(j => ("a", Timestamp.valueOf(s"$day 0${j % 9}:00:00")))
    }
    val r = TimeSeries.holtWinters(rows.toDF("k", "t"), "k", "t")
      .collect().head
    val (l, b, s, fc, sae) = hwRef(eds, ys.map(_.toLong))
    assert(r.getLong(2) == l && r.getLong(3) == b && r.getLong(14) == sae)
    (0 to 6).foreach(i => assert(r.getLong(4 + i) == s(i), s"s$i"))
    assert((11 to 13).map(r.getLong) == fc)
    val spike = (19723L % 7).toInt
    assert(s(spike) > 10000000L, "spike slot survives the gap")
    assert((0 to 6).filter(_ != spike).forall(i => s(i) < s(spike) / 4),
      "no other slot inherits the spike: " + s.mkString(","))
  }

  test("holtWinters: negative seasonal deviations replay the toward-zero " +
    "truncation (hand-traced first two steps)") {
    // days: 9 (Jan 1), 3 (Jan 2, epoch day 19724, slot 19724%7 = 5):
    // l0=9e6; t=1: pred=9e6, sae=6e6; l1=(3e6-0+27e6)/4=7.5e6;
    // b1=(7.5e6-9e6)/5=-3e5 (toward zero); s5=((3e6-7.5e6)+0)/3=-1.5e6
    val df = dayEvents("a", Seq(9, 3)).toDF("k", "t")
    val r = TimeSeries.holtWinters(df, "k", "t").collect().head
    assert(r.getLong(2) == 7500000L && r.getLong(3) == -300000L)
    assert(r.getLong(4 + 5) == -1500000L && r.getLong(14) == 6000000L)
  }

  test("holtWinters: repartition invariance and ref equality on a " +
    "seeded irregular series") {
    val rnd = new scala.util.Random(17)
    val ys = (1 to 23).map(_ => 1 + rnd.nextInt(20))
    val df = (hwDayEvents("a", ys) ++ hwDayEvents("z", Seq(4))).toDF("k", "t")
    val a = TimeSeries.holtWinters(df, "k", "t").orderBy("k").collect()
    val b = TimeSeries.holtWinters(df.repartition(5), "k", "t")
      .orderBy("k").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val (l, bb, s, fc, sae) = hwRef(hwEds(ys.length), ys.map(_.toLong))
    val ra = a.find(_.getString(0) == "a").get
    assert(ra.getLong(2) == l && ra.getLong(3) == bb &&
      ra.getLong(14) == sae)
    (0 to 6).foreach(i => assert(ra.getLong(4 + i) == s(i)))
    assert((11 to 13).map(ra.getLong) == fc)
  }

  // ------------------------------------------------------------------
  // resampleHourlyLerp (q344) — linear interpolation between
  // surrounding observations, exact integer cents·micros.
  // ------------------------------------------------------------------

  test("hourly lerp: interpolates between surrounding obs, null before " +
    "first, last-instant value without a successor, tie on tieCol") {
    val df = Seq(
      // key 1: 1.00 @ 10:30 (tie pair — id 6 wins with 1.00 over 9.99),
      // 3.00 @ 12:30
      (1L, ts("2026-01-01 10:30:00"), 9.99, 5L),
      (1L, ts("2026-01-01 10:30:00"), 1.00, 6L),
      (1L, ts("2026-01-01 12:30:00"), 3.00, 7L),
      // key 2: single obs exactly on the hour
      (2L, ts("2026-01-01 05:00:00"), 4.00, 8L))
      .toDF("k", "t", "v", "id")
    val got = TimeSeries.resampleHourlyLerp(df, "k", "t", "v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    def us(h: String) = java.time.Instant.parse(h).toEpochMilli * 1000L
    assert(got == Set(
      (1L, us("2026-01-01T10:00:00Z"), None),      // before first obs
      (1L, us("2026-01-01T11:00:00Z"), Some(150L)), // exact midpointish lerp
      (1L, us("2026-01-01T12:00:00Z"), Some(250L)),
      (2L, us("2026-01-01T05:00:00Z"), Some(400L))), got.toString)
  }

  test("hourly lerp: truncating division and repartition invariance") {
    val df = Seq(
      (1L, ts("2026-01-01 10:30:00"), 0.00, 1L),
      (1L, ts("2026-01-01 12:30:00"), 0.01, 2L))
      .toDF("k", "t", "v", "id")
    val got = TimeSeries.resampleHourlyLerp(df, "k", "t", "v", "id")
      .orderBy("hr_us").collect()
    // 11:00 lerp = 0.25 cents -> truncates to 0
    assert(got.map(r => if (r.isNullAt(2)) -1L else r.getLong(2)).toSeq
      == Seq(-1L, 0L, 0L))
    val a = TimeSeries.resampleHourlyLerp(df.repartition(5), "k", "t",
      "v", "id").orderBy("hr_us").collect()
    assert(a.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq)
  }
}
