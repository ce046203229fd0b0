package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Behavior

class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("cohortRetention: users land in their first week's cohort; later weeks offset") {
    // user 1 first seen 2024-01-01 (a Monday), active again 2024-01-10
    // (week of 01-08 → offset 1); user 2 first seen week of 01-08.
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-03 10:00:00"),
      (1L, "2024-01-10 10:00:00"),
      (2L, "2024-01-09 10:00:00")
    ).toDF("user_id", "s").withColumn("ts", to_timestamp(col("s")))
    val got = Behavior.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("2024-01-01", 0L)) == 1L)
    assert(got(("2024-01-01", 1L)) == 1L)
    assert(got(("2024-01-08", 0L)) == 1L)
    assert(got.size == 3)
  }

  test("markovTransitions: adjacency counts and row-normalized probabilities") {
    val ev = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "a", 3L, 3L),
      (1L, "b", 4L, 4L),
      (2L, "a", 1L, 5L), (2L, "a", 2L, 6L)
    ).toDF("user_id", "event_type", "us", "event_id")
    val got = Behavior.markovTransitions(ev, "user_id", "event_type", "us", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // from a: a→b twice (u1), a→a once (u2) → p = 2/3, 1/3
    assert(got(("a", "b"))._1 == 2L)
    assert(got(("a", "a"))._1 == 1L)
    assert(math.abs(got(("a", "b"))._2 - 0.666666667) < 1e-9)
    // from b: b→a once, p = 1
    assert(got(("b", "a")) == ((1L, 1.0)))
  }

  test("attribution: purchases credit the latest earlier touch; none → direct") {
    val ev = Seq(
      (1L, "view", 1L, 1L, 0.0), (1L, "click", 2L, 2L, 0.0),
      (1L, "purchase", 3L, 3L, 10.0),                  // → click
      (1L, "purchase", 4L, 4L, 5.0),                   // still → click
      (2L, "purchase", 1L, 5L, 7.5),                   // no touch → direct
      (3L, "view", 1L, 6L, 0.0), (3L, "purchase", 2L, 7L, 2.25) // → view
    ).toDF("user_id", "event_type", "us", "event_id", "value")
    val got = Behavior.lastTouchAttribution(ev, "user_id", "event_type",
        "us", "event_id", "value", Seq("view", "click"), "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("click") == ((2L, 15.0)))
    assert(got("direct") == ((1L, 7.5)))
    assert(got("view") == ((1L, 2.25)))
  }

  test("rollingZscore: constant series null z; a spike after minN flags") {
    val base = (1 to 10).map(i => (1L, i.toLong, i.toLong, 5.0))
    val spike = Seq((1L, 11L, 11L, 500.0))
    val got = Behavior.rollingZscore(
        (base ++ spike).toDF("user_id", "us", "event_id", "value"),
        "user_id", "us", "event_id", "value")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toMap
    // first rows: n < 5 → null z, not anomalous
    assert(got(1L) == ((None, false)) && got(4L) == ((None, false)))
    // constant window → zero variance → null z
    assert(got(10L) == ((None, false)))
    // the spike against 10 constant 5.0s is way past |z| > 3
    assert(got(11L)._2, "spike must flag")
    assert(got(11L)._1.get > 3.0)
  }

  test("rollingActiveUsers: WAU accumulates the trailing week; stickiness exact") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (1L, "2024-01-03 10:00:00"),
      (3L, "2024-01-09 10:00:00")
    ).toDF("user_id", "s").withColumn("ts", to_timestamp(col("s")))
    val got = graft.ops.Behavior.rollingActiveUsers(ev, "user_id", "ts", 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("2024-01-01") == ((2L, 2L)))
    // day 3: DAU 1 (user 1); WAU = users over 12-28..01-03 = {1,2}
    assert(got("2024-01-03") == ((1L, 2L)))
    // day 9: only user 3 within [01-03, 01-09]? day 3 is 6 back → in window
    assert(got("2024-01-09") == ((1L, 2L)))
    assert(got.size == 3, "only days with DAU are reported")
  }

  test("valueHistogram: all-integer bins cover min..max; max lands in the last bin") {
    val ev = (0 until 100).map(i => Tuple1(i / 100.0 * 10)).toDF("value")
    val rows = Behavior.valueHistogram(ev, "value", 10).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 10L))
    assert(rows.map(_.getLong(2)).sum == 100L)
    assert(rows.head.getLong(1) == 0L, "first bin starts at min cents")
  }

  test("associationRules: pair counts and exact support/confidence/lift") {
    // u1 session: {a,b}; u2 session: {a}; u3 session: {a,b}
    // n_sessions=3, n_a=3, n_b=2, n_ab=2
    val ev = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L),
      (2L, "a", 1L, 3L),
      (3L, "b", 1L, 4L), (3L, "a", 2L, 5L)
    ).toDF("user_id", "event_type", "us", "event_id")
    val got = graft.ops.Behavior.associationRules(ev, "user_id",
        "event_type", "us", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got(("a", "b"))._1 == 2L)
    assert(math.abs(got(("a", "b"))._2 - 2.0 / 3) < 1e-8)   // support
    assert(math.abs(got(("a", "b"))._3 - 2.0 / 3) < 1e-8)   // conf a→b
    assert(got(("b", "a"))._3 == 1.0)                        // conf b→a
    assert(got(("a", "b"))._4 == 1.0)                        // lift = (2·3)/(3·2)
  }

  test("associationRules: a session gap splits baskets") {
    val gap = 1800L * 1000000L
    val ev = Seq(
      (1L, "a", 0L, 1L), (1L, "b", gap + 1L, 2L) // separate sessions
    ).toDF("user_id", "event_type", "us", "event_id")
    val got = graft.ops.Behavior.associationRules(ev, "user_id",
      "event_type", "us", "event_id").collect()
    assert(got.isEmpty, "no co-occurrence across the gap")
  }

  test("sessionPatternMatch: ordered session strings; only clean funnels match") {
    val gap = 1800L * 1000000L
    val pat = "view(>(view|click|signup))*>purchase"
    val ev = Seq(
      (1L, "view", 1L, 1L), (1L, "click", 2L, 2L), (1L, "purchase", 3L, 3L),
      (2L, "view", 1L, 4L), (2L, "error", 2L, 5L), (2L, "purchase", 3L, 6L),
      (3L, "purchase", 1L, 7L),
      (4L, "view", 1L, 8L), (4L, "purchase", gap + 2L, 9L) // split sessions
    ).toDF("user_id", "event_type", "us", "event_id")
    val got = graft.ops.Behavior.sessionPatternMatch(ev, "user_id",
        "event_type", "us", "event_id", pat)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(3), r.getBoolean(4))).toMap
    assert(got((1L, 1L)) == (("view>click>purchase", true)))
    assert(got((2L, 1L)) == (("view>error>purchase", false)), "error breaks it")
    assert(got((3L, 1L)) == (("purchase", false)))
    assert(!got((4L, 1L))._2 && !got((4L, 2L))._2, "gap split kills the chain")
  }

  test("valueHistogram: a single distinct value collapses to one bin") {
    val ev = Seq(1.0, 1.0, 1.0).map(Tuple1(_)).toDF("value")
    val rows = Behavior.valueHistogram(ev, "value", 10).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 0L &&
      rows.head.getLong(2) == 3L)
  }

  test("kaplanMeier: textbook curve — risk sets, flat censor steps, exact lnS") {
    // durations: 1(event), 2(censored), 3(event×2), 4(censored)
    val subj = Seq(("g", 1L, true), ("g", 2L, false), ("g", 3L, true),
      ("g", 3L, true), ("g", 4L, false)).toDF("g", "t", "ev")
    val got = Behavior.kaplanMeier(subj, "g", "t", "ev")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    def ln9(x: Double): Long =
      BigDecimal(math.log(x)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000000L)).toLongExact
    def surv(lnS9: Long): Double =
      BigDecimal(math.exp(lnS9.toDouble / 1e9))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = ln9(4.0 / 5.0)
    val s3 = s1 + ln9(1.0 / 3.0)
    assert(got.toSeq == Seq(
      (1L, 5L, 1L, 0L, s1, surv(s1)),
      (2L, 4L, 0L, 1L, s1, surv(s1)), // censoring keeps the curve flat
      (3L, 3L, 2L, 0L, s3, surv(s3)),
      (4L, 1L, 0L, 1L, s3, surv(s3))))
  }

  test("kaplanMeier: exhausted risk set → survival exactly 0; all-censored → 1") {
    val dieOut = Seq(("a", 1L, true), ("a", 2L, true)).toDF("g", "t", "ev")
    val d = Behavior.kaplanMeier(dieOut, "g", "t", "ev").collect()
    assert(d.last.getDouble(6) == 0.0, "d = n_risk drives S to exact zero")
    val cens = Seq(("b", 5L, false), ("b", 9L, false)).toDF("g", "t", "ev")
    val c = Behavior.kaplanMeier(cens, "g", "t", "ev").collect()
    assert(c.forall(_.getDouble(6) == 1.0), "censoring alone never drops S")
  }

  test("rleSequences: runs collapse in order, ts ties break by id") {
    // user 1: a a b a → a:2,b:1,a:1 (interleaving survives); the two
    // events at ts=30 order by event_id, so b:1 precedes the final a
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "b", 30L, 3L),
      (1L, "a", 30L, 4L),
      (2L, "c", 5L, 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.rleSequences(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((4L, 3L, "a:2,b:1,a:1")))
    assert(got(2L) == ((1L, 1L, "c:1")))
  }

  test("linearAttribution: exact ppm split with largest-remainder, reconciles to conversions") {
    // user 1: 3 touches (view, view, click) then purchase → each gets
    // 333333 ppm, first view takes the remainder (+1)
    // user 2: 1 click then purchase → 1000000
    val ev = Seq(
      (1L, "view", 10L, 1L), (1L, "view", 20L, 2L), (1L, "click", 30L, 3L),
      (1L, "purchase", 40L, 4L),
      (2L, "click", 5L, 5L), (2L, "purchase", 9L, 6L),
      (3L, "purchase", 1L, 7L)) // no touches → drops
      .toDF("user_id", "event_type", "us", "event_id")
    val out = Behavior.linearAttribution(ev, "user_id", "event_type",
        "us", "event_id", Seq("view", "click"), "purchase")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_touches"), r.getAs[Long]("credit_ppm"))).toMap
    assert(out("view") == ((2L, 666667L)), out.toString)   // 333334 + 333333
    assert(out("click") == ((2L, 1333333L)))               // 333333 + 1000000
    assert(out.values.map(_._2).sum == 2000000L,
      "total credit must reconcile to conversions × 1e6")
  }

  test("rfmFeatures: exact metrics, quintiles deal evenly, score 1 is best") {
    val day = 86400000000L
    val ev = (1 to 10).flatMap { u =>
      // user u: u events, last event (10-u) days before the corpus max,
      // spend 100·u cents each
      (1 to u).map(i => (u.toLong, (10L - u) * -day + i, 100L * u))
    }.toDF("user_id", "us", "cents")
    val out = Behavior.rfmFeatures(ev, "user_id", "us", "cents")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Long]("monetary"), r.getAs[Long]("r_q"),
          r.getAs[Long]("f_q"), r.getAs[Long]("m_q"))).toMap
    // user 10: most recent, most frequent, highest spend → 1,1,1
    assert(out(10L)._4 == 1L && out(10L)._5 == 1L && out(10L)._6 == 1L)
    assert(out(1L)._4 == 5L && out(1L)._5 == 5L && out(1L)._6 == 5L)
    assert(out(10L)._2 == 10L && out(10L)._3 == 10000L)
    assert(out(1L)._1 == 9L, "9 whole days stale")
    // ntile(5) over 10 users → exactly 2 per bucket per dimension
    assert(out.values.groupBy(_._4).values.forall(_.size == 2))
  }

  test("markovEval: deterministic cycle self-predicts perfectly; minority transitions flagged") {
    // users cycle a→b→a→b…, one user throws in a→c once: the model
    // predicts b after a (majority), so the a→c cell is the one error
    val ev =
      (1 to 3).flatMap(u => (0 until 6).map(i =>
        (u.toLong, if (i % 2 == 0) "a" else "b", i.toLong * 10, i.toLong))) ++
        Seq((9L, "a", 0L, 0L), (9L, "c", 10L, 1L))
    val out = Behavior.markovEval(ev.toDF("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getAs[Long]("n"), r.getAs[Long]("correct"))).toMap
    assert(out(("a", "b")) == (("b", 9L, 1L)))
    assert(out(("b", "a")) == (("a", 6L, 1L)))
    assert(out(("a", "c")) == (("b", 1L, 0L)), "minority transition must be a miss")
  }
}
