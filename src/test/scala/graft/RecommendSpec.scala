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

  test("holdoutHitRate: hand-traced split, scoring, and hit decision") {
    // u1 history: 1,2 then NOVEL 3 last → test_item 3, train {1,2}
    // u2 history: 1,2,3 → test 3, train {1,2}
    // u3 history: 2,3,1 → test 1, train {2,3}
    // sims on train: u1{1,2}, u2{1,2}, u3{2,3}:
    //   deg 1→2, 2→3, 3→1; co (1,2)=2, (2,3)=1
    //   cos(1,2)=2/√6≈.8165, cos(2,3)=1/√3≈.5774
    // u1 candidates: nbrs of 1 → {2 seen}; nbrs of 2 → {1 seen, 3: .5774}
    //   → top: 3 → HIT. u2 identical → HIT.
    // u3 candidates: nbrs of 2 → {1: .8165, 3 seen}; nbrs of 3 → {2 seen}
    //   → top: 1 → HIT. 3/3.
    val rows = Seq(
      (1L, 1L, 1L, 1L), (1L, 2L, 2L, 2L), (1L, 3L, 3L, 3L),
      (2L, 1L, 1L, 4L), (2L, 2L, 2L, 5L), (2L, 3L, 3L, 6L),
      (3L, 2L, 1L, 7L), (3L, 3L, 2L, 8L), (3L, 1L, 3L, 9L))
      .toDF("u", "i", "t", "e")
    val r = Recommend.holdoutHitRate(rows, "u", "i", "t", "e",
      maxUserItems = 10, simTopN = 5, k = 2).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getDouble(2) == 1.0)
  }

  test("holdoutHitRate: a user can also miss; repeat touches aren't novel") {
    // u1: 1,2,3 (test 3, train {1,2}); u2: 3,1,3 → firsts: 3@1, 1@2 →
    // test 1, train {3}; u3: 1,3,1 → test 3, train {1}
    // sims over train {u1:{1,2}, u2:{3}, u3:{1}}: only pair (1,2) co=1,
    //   deg 1→2, 2→1 (u2/u3 singles add deg to 3 and 1)
    // u1: nbrs of 1→{2 seen}, nbrs of 2→{1 seen} → no candidates → MISS
    // u2: item 3 has no neighbors → MISS; u3: nbrs of 1 → {2: cos} →
    //   top [2], test 3 → MISS. 0/3 hits.
    val rows = Seq(
      (1L, 1L, 1L, 1L), (1L, 2L, 2L, 2L), (1L, 3L, 3L, 3L),
      (2L, 3L, 1L, 4L), (2L, 1L, 2L, 5L), (2L, 3L, 3L, 6L),
      (3L, 1L, 1L, 7L), (3L, 3L, 2L, 8L), (3L, 1L, 3L, 9L))
      .toDF("u", "i", "t", "e")
    val r = Recommend.holdoutHitRate(rows, "u", "i", "t", "e",
      maxUserItems = 10, simTopN = 5, k = 2).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 0L && r.getDouble(2) == 0.0)
  }

  test("itemItemCosine: no pairs → empty result, not an error") {
    // every user touches a single item — nothing to pair
    val got = Recommend.itemItemCosine(
      Seq((1L, 1L), (2L, 2L)).toDF("u", "i"), "u", "i", 10, 3)
    assert(got.count() == 0L)
  }
}
