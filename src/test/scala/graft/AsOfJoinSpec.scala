package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def left = Seq(
    // (id, key, ts)
    (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u1", 50L),
    (4L, "u2", 100L), (5L, "u3", 100L)
  ).toDF("id", "k", "ts")

  private def right = Seq(
    // (key, ts, v)
    ("u1", 100L, 1.0), ("u1", 150L, 2.0),
    ("u2", 101L, 3.0)
  ).toDF("k", "rts", "v")

  test("inclusive as-of: latest right row with rts <= ts, null when none") {
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
        payload = Seq("rts", "v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4))))).toMap
    assert(got == Map(
      1L -> Some((100L, 1.0)), // equal ts matches (inclusive)
      2L -> Some((150L, 2.0)), // latest of the two
      3L -> None,              // nothing at or before 50
      4L -> None,              // u2's only right row is later
      5L -> None))             // u3 has no right rows
  }

  test("strict as-of excludes equal-ts right rows") {
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
        payload = Seq("v"), inclusive = false)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L).isEmpty) // rts=100 no longer visible at ts=100
    assert(got(2L).contains(2.0))
  }

  test("left columns and row count are preserved exactly") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
      payload = Seq("v"), prefix = "p_")
    assert(out.columns.toSeq == Seq("id", "k", "ts", "p_v"))
    assert(out.count() == left.count())
    assert(out.select("id", "k", "ts").collect().toSet ==
      left.select("id", "k", "ts").collect().toSet)
  }

  test("native sort-merge exec: same results as the window formulation") {
    for (incl <- Seq(true, false)) {
      val win = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
        payload = Seq("rts", "v"), inclusive = incl)
      val mrg = AsOfJoin.asOfMerge(left, right, Seq("k"), "ts", "rts",
        payload = Seq("rts", "v"), inclusive = incl)
      assert(mrg.columns.toSeq == win.columns.toSeq)
      assert(mrg.collect().toSet == win.collect().toSet, s"inclusive=$incl")
    }
  }

  test("native exec plans as AsOfJoinExec with clustered exchanges, and self-joins work") {
    val ev = graft.io.Tables.events(spark, TestSession.sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
    val mrg = AsOfJoin.asOfMerge(clicks, purchases, Seq("user_id"), "us", "p_us",
      payload = Seq("p_us"), prefix = "")
    val plan = mrg.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ") && plan.contains("Exchange hashpartitioning"),
      plan.take(500))
    val win = AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "us", "p_us",
      payload = Seq("p_us"), prefix = "")
    assert(mrg.collect().toSet == win.collect().toSet)
  }

  test("null keys and null timestamps never match (SQL semantics)") {
    val l = Seq((1L, Some("a"), Some(100L)), (2L, None, Some(100L)),
        (3L, Some("a"), None))
      .toDF("id", "k", "ts")
    val r = Seq((Some("a"), Some(50L), 1.0), (None, Some(40L), 2.0),
        (Some("a"), None, 3.0))
      .toDF("k", "rts", "v")
    for (f <- Seq(AsOfJoin.asOf _, AsOfJoin.asOfMerge _)) {
      val got = f(l, r, Seq("k"), "ts", "rts", Seq("v"), "p_", true)
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toMap
      assert(got == Map(
        1L -> Some(1.0), // normal match; null-ts right row (3.0) skipped
        2L -> None,      // null left key matches nothing (not the null right key)
        3L -> None))     // null left ts matches nothing
    }
  }

  test("asOfMerge rejects mismatched key/ts types loudly") {
    val l = Seq((1L, 1, 100L)).toDF("id", "k", "ts")
    val r = Seq((1L, 90L, 1.0)).toDF("k", "rts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfMerge(l, r, Seq("k"), "ts", "rts", Seq("v"))
    }
    assert(e.getMessage.contains("type mismatch"))
  }

  test("keyless global as-of works; asOfMerge rejects empty keys") {
    val l = Seq((1L, 100L), (2L, 40L)).toDF("id", "ts")
    val r = Seq((50L, 1.0), (90L, 2.0)).toDF("rts", "v")
    val got = AsOfJoin.asOf(l, r, Seq(), "ts", "rts", Seq("v"))
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toMap
    assert(got == Map(1L -> Some(2.0), 2L -> None))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfMerge(l, r, Seq(), "ts", "rts", Seq("v"))
    }
    assert(e.getMessage.contains("at least one key"))
  }

  test("reserved internal names and payload-prefix collisions are rejected") {
    val l = Seq((1L, 1, 100L)).toDF("id", "k", "ts")
    val r = Seq((1, 90L, 1.0)).toDF("k", "rts", "v")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l.withColumnRenamed("id", "_p"), r, Seq("k"), "ts", "rts", Seq("v"))
    }
    assert(e1.getMessage.contains("_p"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r.withColumnRenamed("v", "_asof"), Seq("k"), "ts", "rts", Seq("_asof"))
    }
    assert(e2.getMessage.contains("_asof"))
    // prefixed payload landing on an existing left column
    val e3 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l.withColumnRenamed("id", "asof_v"), r, Seq("k"), "ts", "rts", Seq("v"))
    }
    assert(e3.getMessage.contains("collide"))
    val e4 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfMerge(l.withColumnRenamed("id", "asof_v"), r, Seq("k"), "ts", "rts", Seq("v"))
    }
    assert(e4.getMessage.contains("collide"))
  }

  test("composite keys: both formulations agree with brute force") {
    val l = Seq((1L, "a", 1L, 100L), (2L, "a", 2L, 100L), (3L, "b", 1L, 100L))
      .toDF("id", "k1", "k2", "ts")
    val r = Seq(("a", 1L, 90L, 1.0), ("a", 2L, 95L, 2.0), ("b", 2L, 80L, 3.0))
      .toDF("k1", "k2", "rts", "v")
    val expected = Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None)
    for (f <- Seq(AsOfJoin.asOf _, AsOfJoin.asOfMerge _)) {
      val got = f(l, r, Seq("k1", "k2"), "ts", "rts", Seq("v"), "p_", true)
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(4)) None else Some(row.getDouble(4)))).toMap
      assert(got == expected)
    }
  }

  test("randomized: window, native exec, and brute force agree (both modes)") {
    val rnd = new scala.util.Random(11)
    val l = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(12)).toString, rnd.nextInt(25).toLong)).toDF("id", "k", "ts")
    // right unique per (k, rts): max v wins (deterministic pre-reduction)
    val r = (1 to 150).map(_ =>
        ((rnd.nextInt(12)).toString, rnd.nextInt(25).toLong, rnd.nextInt(1000).toDouble))
      .toDF("k", "rts", "v")
      .groupBy("k", "rts").agg(max("v").as("v"))
    for (incl <- Seq(true, false)) {
      val cmp = if (incl) "<=" else "<"
      val brute = l.as("l").join(r.as("r"),
          expr(s"l.k = r.k AND r.rts $cmp l.ts"), "left")
        .groupBy(col("l.id")).agg(max(struct(col("r.rts"), col("r.v"))).as("m"))
        .collect().map(row => row.getLong(0) -> {
          // no match → struct(null, null), not a null struct
          if (row.isNullAt(1) || row.getStruct(1).isNullAt(1)) None
          else Some(row.getStruct(1).getDouble(1))
        }).toMap
      for (f <- Seq(AsOfJoin.asOf _, AsOfJoin.asOfMerge _)) {
        val got = f(l, r, Seq("k"), "ts", "rts", Seq("v"), "p_", incl)
          .collect().map(row => row.getLong(0) ->
            (if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toMap
        assert(got == brute, s"inclusive=$incl")
      }
    }
  }

  test("matches a brute-force as-of on the events table") {
    val ev = graft.io.Tables.events(spark, TestSession.sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
    val got = AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "us", "p_us",
        payload = Seq("p_us"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // brute force: non-equi join + max
    val brute = clicks.as("c")
      .join(purchases.as("p"),
        col("c.user_id") === col("p.user_id") && col("p.p_us") <= col("c.us"),
        "left")
      .groupBy(col("c.event_id")).agg(max(col("p.p_us")).as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == brute)
    assert(got.values.exists(_.nonEmpty), "corpus should produce some matches")
  }
}
