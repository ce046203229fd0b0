package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Skyline.pareto2D]] — brute-force dominance equivalence
  * on seeded random data, tie/duplicate retention, and invariance to
  * the bucket count (phase-1 pruning must never drop a frontier row).
  */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import graft.ops.Skyline

  private def brute(pts: Seq[(Long, Int, Double)]): Set[Long] =
    pts.filterNot { case (_, s, p) =>
      pts.exists { case (_, s2, p2) =>
        s2 >= s && p2 <= p && (s2 > s || p2 < p) }
    }.map(_._1).toSet

  private val rnd = new scala.util.Random(42)
  private val pts: Seq[(Long, Int, Double)] =
    (1L to 400L).map(i => (i, rnd.nextInt(50), (rnd.nextInt(2000) + 1) / 4.0))

  test("matches the quadratic dominance definition on seeded random data") {
    import spark.implicits._
    val got = Skyline.pareto2D(pts.toDF("id", "size", "price"), "size", "price")
      .select("id").as[Long].collect().toSet
    assert(got == brute(pts))
    assert(got.nonEmpty && got.size < pts.size)
  }

  test("duplicate frontier points are BOTH kept (neither dominates)") {
    import spark.implicits._
    // (10, 5.0) twice on the frontier; (11, 6.0) trades price for size;
    // (9, 5.5) is dominated by the duplicates
    val dup = Seq((1L, 10, 5.0), (2L, 10, 5.0), (3L, 9, 5.5), (4L, 11, 6.0))
    val got = Skyline.pareto2D(dup.toDF("id", "size", "price"), "size", "price")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L), "equal pair survives, dominated row drops")
  }

  test("bucket count never changes the result (local prune is lossless)") {
    import spark.implicits._
    val df = pts.toDF("id", "size", "price")
    val one = Skyline.pareto2D(df, "size", "price", nBuckets = 1)
      .select("id").as[Long].collect().toSet
    val many = Skyline.pareto2D(df.repartition(7), "size", "price", nBuckets = 64)
      .select("id").as[Long].collect().toSet
    assert(one == many)
  }
}
