package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Recommend

class RecommendSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("itemItemCosine: hand case — co-counts, degrees, cosine, top-N order") {
    // u1:{1,2,3} u2:{1,2} u3:{2,3}; u4 touches 5 items and exceeds the
    // cap of 4, so it must be pruned before pairing
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L)) ++ (1L to 5L).map(i => (4L, i))
    val got = Recommend.itemItemCosine(rows.toDF("u", "i"), "u", "i",
        maxUserItems = 4, topN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(5), r.getLong(6)))
    // deg: 1→2, 2→3, 3→2; co: (1,2)=2, (1,3)=1, (2,3)=2
    // cos(1,2) = cos(2,3) = 2/√6 = .816496581; cos(1,3) = 1/2
    val c12 = BigDecimal(2.0 / math.sqrt(6.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, c12, 1L), (1L, 3L, 1L, 0.5, 2L),
      (2L, 1L, 2L, c12, 1L), (2L, 3L, 2L, c12, 2L), // tie → neighbor asc
      (3L, 2L, 2L, c12, 1L), (3L, 1L, 1L, 0.5, 2L)))
  }

  test("itemItemCosine: duplicate interactions collapse (implicit feedback)") {
    val once = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    val dup = once ++ once ++ once
    val a = Recommend.itemItemCosine(once.toDF("u", "i"), "u", "i", 10, 3)
      .collect().toSeq
    val b = Recommend.itemItemCosine(dup.toDF("u", "i"), "u", "i", 10, 3)
      .collect().toSeq
    assert(a == b)
  }

  test("itemItemCosine: no pairs → empty result, not an error") {
    // every user touches a single item — nothing to pair
    val got = Recommend.itemItemCosine(
      Seq((1L, 1L), (2L, 2L)).toDF("u", "i"), "u", "i", 10, 3)
    assert(got.count() == 0L)
  }
}
