package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("half-open boundaries, multi-cell spans, overlaps, empty intervals") {
    val points = Seq((1L, 0.0), (2L, 5.0), (3L, 9.999), (4L, 10.0), (5L, 25.0))
      .toDF("pid", "v")
    val intervals = Seq(
      ("a", 0.0, 10.0),   // spans cells 0-3 at cell=3
      ("b", 5.0, 10.0),   // overlaps a
      ("c", 10.0, 10.0),  // empty — matches nothing
      ("d", 9.0, 11.0))   // crosses the 10 boundary
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 3.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (1L, "a"),             // v=0: lo inclusive
      (2L, "a"), (2L, "b"),  // overlap → two matches
      (3L, "a"), (3L, "b"), (3L, "d"),
      (4L, "d"),             // v=10: hi exclusive for a/b, inside d
      // v=25 matches nothing
    ))
  }

  test("grid join == naive non-equi join on seeded random data") {
    val points = spark.range(500).select(col("id").as("pid"),
      (pmod(hash(col("id")), lit(1000)).cast("double") / 10.0).as("v"))
    val intervals = spark.range(80).select(col("id").as("iid"),
      (pmod(hash(col("id") + 7), lit(900)).cast("double") / 10.0).as("lo"))
      .withColumn("hi", col("lo") + (pmod(hash(col("iid") * 3), lit(150)).cast("double") / 10.0))
    val grid = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 4.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        points("v") >= intervals("lo") && points("v") < intervals("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid == naive)
    assert(naive.nonEmpty, "seeded data should produce matches")
  }

  test("negative domains: floor-based cells stay correct below zero") {
    val points = Seq((1L, -7.5), (2L, -0.1), (3L, 0.0)).toDF("pid", "v")
    val intervals = Seq(("a", -10.0, -5.0), ("b", -1.0, 1.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 3.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "b")))
  }

  test("integral inputs beyond 2^53: exact long cells, no double rounding") {
    // 2^53 + {1,3} are not representable as doubles (they round to
    // 2^53 / 2^53+4) — the double path mis-cells these and silently
    // drops the match; the exact integral path must keep it.
    val base = 1L << 53
    val points = Seq((1L, base + 1L), (2L, base + 3L), (3L, base - 2L)).toDF("pid", "v")
    val intervals = Seq(("a", base + 1L, base + 4L), ("b", base - 5L, base)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "a"), (3L, "b")))
    // negative integral domain still floors correctly in the exact path
    val np = Seq((1L, -7L), (2L, -1L), (3L, 0L)).toDF("pid", "v")
    val ni = Seq(("a", -10L, -5L), ("b", -1L, 1L)).toDF("iid", "lo", "hi")
    val ngot = RangeJoin.pointInInterval(np, ni, "v", "lo", "hi", 3.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ngot == Set((1L, "a"), (2L, "b"), (3L, "b")))
  }

  test("overlapJoin == naive non-equi join, each pair exactly once") {
    val a = spark.range(300).select(col("id").as("aid"),
        pmod(hash(col("id")), lit(1000)).cast("long").as("lo_a"))
      .withColumn("hi_a", col("lo_a") + 1 + pmod(hash(col("aid") * 7), lit(60)).cast("long"))
    val b = spark.range(200).select(col("id").as("bid"),
        pmod(hash(col("id") + 13), lit(1000)).cast("long").as("lo_b"))
      .withColumn("hi_b", col("lo_b") + 1 + pmod(hash(col("bid") * 3), lit(90)).cast("long"))
    val grid = RangeJoin.overlapJoin(a, b, "lo_a", "hi_a", "lo_b", "hi_b", 16.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = a.join(b, col("lo_a") < col("hi_b") && col("lo_b") < col("hi_a"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid.length == grid.toSet.size, "pairs must be emitted exactly once")
    assert(grid.toSet == naive)
    assert(naive.nonEmpty)
    // shared column names are rejected (result carries both sides)
    val e = intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(a, a, "lo_a", "hi_a", "lo_a", "hi_a", 16.0)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("overlapJoin: result is cell-size-invariant (integral and fractional cells)") {
    val a = spark.range(120).select(col("id").as("aid"),
        pmod(hash(col("id")), lit(500)).cast("long").as("lo_a"))
      .withColumn("hi_a", col("lo_a") + 1 + pmod(hash(col("aid") * 5), lit(40)).cast("long"))
    val b = spark.range(90).select(col("id").as("bid"),
        pmod(hash(col("id") + 3), lit(500)).cast("long").as("lo_b"))
      .withColumn("hi_b", col("lo_b") + 1 + pmod(hash(col("bid") * 11), lit(70)).cast("long"))
    val naive = a.join(b, col("lo_a") < col("hi_b") && col("lo_b") < col("hi_a"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (cell <- Seq(1.0, 3.0, 7.5, 16.0, 64.0, 1000.0)) {
      val got = RangeJoin.overlapJoin(a, b, "lo_a", "hi_a", "lo_b", "hi_b", cell)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicates at cell=$cell")
      assert(got.toSet == naive, s"mismatch at cell=$cell")
    }
  }

  test("overlapJoin: exact integral cells beyond 2^53 and negative domains") {
    val base = 1L << 53
    val a = Seq((1L, base + 1L, base + 4L), (2L, base - 9L, base - 6L)).toDF("aid", "lo_a", "hi_a")
    val b = Seq((10L, base + 3L, base + 8L), (11L, base - 8L, base - 7L)).toDF("bid", "lo_b", "hi_b")
    val got = RangeJoin.overlapJoin(a, b, "lo_a", "hi_a", "lo_b", "hi_b", 2.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
    val na = Seq((1L, -10L, -4L)).toDF("aid", "lo_a", "hi_a")
    val nb = Seq((10L, -5L, -1L), (11L, -20L, -10L)).toDF("bid", "lo_b", "hi_b")
    val ngot = RangeJoin.overlapJoin(na, nb, "lo_a", "hi_a", "lo_b", "hi_b", 3.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ngot == Set((1L, 10L))) // [-20,-10) does not overlap [-10,-4)
  }

  test("plan is an equi join on the cell key, no nested-loop/cartesian") {
    val points = spark.range(100).select(col("id").as("pid"),
      col("id").cast("double").as("v"))
    val intervals = spark.range(100).select(col("id").as("iid"),
      col("id").cast("double").as("lo"), (col("id") + 5).cast("double").as("hi"))
    val plan = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
