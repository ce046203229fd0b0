package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ZoneMap

class ZoneMapSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("blocks tile the sorted order; min/max bound each block; skip flags match") {
    // keys 000..099 shuffled in; block size 25 → 4 blocks of 25
    val rows = scala.util.Random.shuffle((0 until 100).toList)
      .map(i => (f"$i%03d", i.toLong)).toDF("k", "id")
    val got = ZoneMap.report(rows, col("k"), Seq(col("id")),
        blockSize = 25, predLo = "025", predHi = "050")
      .collect()
    assert(got.length == 4 && got.forall(_.getLong(1) == 25L))
    val b = got.map(r => (r.getLong(0), r.getString(2), r.getString(3),
      r.getBoolean(4)))
    assert(b(0) == ((0L, "000", "024", true)),  "below the range → skip")
    assert(b(1) == ((1L, "025", "049", false)), "inside → must read")
    assert(b(2) == ((2L, "050", "074", true)),  "at/after predHi → skip")
    assert(b(3) == ((3L, "075", "099", true)))
  }

  test("a straggler block keeps its true row count") {
    val rows = (0 until 10).map(i => (f"$i%02d", i.toLong)).toDF("k", "id")
    val got = ZoneMap.report(rows, col("k"), Seq(col("id")),
      blockSize = 4, predLo = "00", predHi = "99").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(4L, 4L, 2L))
  }

  test("layoutSkipping: a second-dim box skips under z-order, not under lex") {
    // 64×64 grid, one row per cell: lex blocks sweep full y ranges,
    // z blocks stay locally bounded in both dims
    val df = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong, x.toLong * 64 + y))).toDF("x", "y", "id")
    val out = ZoneMap.layoutSkipping(df, col("x"), col("y"),
        Seq(col("id")), blockSize = 256,
        xLo = 0L, xHi = 63L, yLo = 0L, yHi = 3L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_skipped"), r.getAs[Long]("rows_scanned"))).toMap
    assert(out("lex")._1 == 0L,
      "lex can't skip when the leading column is unconstrained")
    assert(out("zorder")._1 > 0L, s"z-order must skip: ${out("zorder")}")
    assert(out("zorder")._2 < out("lex")._2)
  }

  // ---- ZoneMap.clusteringDepth (q347) ----

  test("clusteringDepth: disjoint zones depth 1, nested/overlapping " +
    "count exactly, touching half-open ranges do not stack") {
    import spark.implicits._
    import graft.ops.ZoneMap
    def run(fs: Seq[(Long, Long)]) =
      ZoneMap.clusteringDepth(fs.toDF("lo", "hi")).collect().head
    val disjoint = run(Seq((1L, 5L), (6L, 9L), (10L, 20L)))
    assert(disjoint.getLong(0) == 3L && disjoint.getLong(1) == 1L)
    // [1,10] ⊃ [2,3] plus [3,8]: point 3 covered by all three
    val nested = run(Seq((1L, 10L), (2L, 3L), (3L, 8L)))
    assert(nested.getLong(1) == 3L)
    // adjacent inclusive ranges [1,5],[5,9] DO share point 5 → depth 2;
    // [1,4],[5,9] don't → depth 1
    assert(run(Seq((1L, 5L), (5L, 9L))).getLong(1) == 2L)
    assert(run(Seq((1L, 4L), (5L, 9L))).getLong(1) == 1L)
  }
}
