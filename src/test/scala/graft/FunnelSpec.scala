package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Funnel

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, Long)]) =
    Funnel.funnel(
      rows.toDF("user_id", "event_type", "us", "event_id"),
      "user_id", "event_type", "us", "event_id",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("stages gate strictly in order; out-of-order events don't count") {
    val m = run(Seq(
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (1L, "purchase", 30L, 3L),
      (2L, "click", 5L, 4L), (2L, "view", 10L, 5L), // click BEFORE the view
      (4L, "view", 40L, 6L), (4L, "click", 45L, 7L), (4L, "purchase", 50L, 8L),
      (5L, "purchase", 1L, 9L)                      // never viewed → absent
    ))
    assert(m(1L).getAs[Long]("stage") == 3L)
    assert(m(1L).getAs[Long]("view_us") == 10L &&
      m(1L).getAs[Long]("click_us") == 20L &&
      m(1L).getAs[Long]("purchase_us") == 30L)
    assert(m(2L).getAs[Long]("stage") == 1L, "pre-view click must not gate")
    assert(m(2L).isNullAt(m(2L).fieldIndex("click_us")))
    assert(m(4L).getAs[Long]("stage") == 3L)
    assert(!m.contains(5L), "users without stage 1 are not in the funnel")
  }

  test("equal timestamps order by event id (deterministic strictness)") {
    val m = run(Seq(
      (1L, "view", 10L, 5L), (1L, "click", 10L, 6L),   // same us, later id → counts
      (2L, "view", 10L, 9L), (2L, "click", 10L, 8L)))  // same us, earlier id → not after
    assert(m(1L).getAs[Long]("stage") == 2L)
    assert(m(2L).getAs[Long]("stage") == 1L)
  }

  test("the earliest qualifying event wins each stage") {
    val m = run(Seq(
      (1L, "view", 10L, 1L), (1L, "view", 5L, 2L),    // first view at 5
      (1L, "click", 7L, 3L), (1L, "click", 20L, 4L))) // first click after 5 → 7
    assert(m(1L).getAs[Long]("view_us") == 5L)
    assert(m(1L).getAs[Long]("click_us") == 7L)
  }
}
