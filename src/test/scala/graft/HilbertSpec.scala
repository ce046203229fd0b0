package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Hilbert

/** The tables are derived, so the spec proves Hilbert-ness from the
  * curve's DEFINING properties rather than a second hand-written
  * implementation: a bijection onto [0, 4^bits) whose consecutive
  * indices are always grid-adjacent (unit steps — the property Morton
  * lacks and the whole reason the operator exists). */
class HilbertSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val bits = 5 // 32×32 grid = 1024 cells, full enumeration

  private lazy val grid = {
    val n = 1 << bits
    val xy = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    Hilbert.withHilbert(xy.toDF("x", "y"), col("x"), col("y"), bits, "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("bijection: every cell gets a distinct index in [0, 4^bits)") {
    val ds = grid.map(_._3).sorted
    assert(ds.toSeq == (0L until (1L << (2 * bits))).toSeq)
  }

  test("unit steps: consecutive indices are grid-adjacent (Manhattan 1)") {
    val byD = grid.sortBy(_._3)
    byD.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("origin anchors the canonical orientation") {
    assert(grid.find(t => t._1 == 0L && t._2 == 0L).get._3 == 0L)
  }

  test("SQL CTE mirror computes identical indices (run through Spark SQL)") {
    val n = 1 << bits
    val xy = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    xy.toDF("x", "y").createOrReplaceTempView("hilbert_grid")
    val (ctes, last, dcol) = Hilbert.hilbertSqlCtes("base", Seq("x", "y"), bits)
    val sql =
      s"""WITH base AS (SELECT x, y, x AS hx, y AS hy FROM hilbert_grid),
         |$ctes
         |SELECT x, y, $dcol AS d FROM $last""".stripMargin
    val viaSql = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    assert(viaSql.toSeq == grid.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("masking: out-of-range coordinates wrap instead of corrupting") {
    val d0 = Hilbert.withHilbert(Seq((3L, 5L)).toDF("x", "y"),
      col("x"), col("y"), bits, "d").collect().head.getLong(2)
    val dMasked = Hilbert.withHilbert(
      Seq((3L + (1L << bits), 5L)).toDF("x", "y"),
      col("x"), col("y"), bits, "d").collect().head.getLong(2)
    assert(d0 == dMasked)
  }

  test("clusterByHilbert: partitions cover disjoint ascending index ranges") {
    val n = 1 << bits
    val xy = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val clustered = Hilbert.clusterByHilbert(xy.toDF("x", "y"),
      col("x"), col("y"), bits, 4)
    val ranges = Hilbert.withHilbert(clustered, col("x"), col("y"), bits, "d")
      .select(spark_partition_id().as("p"), col("d"))
      .groupBy("p").agg(min("d").as("lo"), max("d").as("hi"))
      .orderBy("p").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, "partition index ranges must be disjoint and ordered")
    }
  }
}
