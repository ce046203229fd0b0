package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cluster.KMeansParallel

/** reclusterRoundExact (the distributed, oracle-anchored K-Means‖
  * phase-4 round behind q120) must agree with the driver-side
  * [[KMeansParallel.recluster]] it anchors: same assignment, same
  * weighted means (to double noise), same empty-cluster fallback. */
class ReclusterSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val cands: IndexedSeq[Map[String, Double]] = IndexedSeq(
    Map("a" -> 1.0, "b" -> 0.2),
    Map("c" -> 0.9, "d" -> 0.4),
    Map("a" -> 0.8, "b" -> 0.3, "c" -> 0.1),
    Map("c" -> 1.1, "d" -> 0.2),
    Map("a" -> 0.5, "e" -> 0.7),
    Map("d" -> 0.6, "e" -> 0.1))
  private val ws: IndexedSeq[Double] = IndexedSeq(2, 1, 3, 2, 1, 2).map(_.toDouble)

  private def distributed(cs: IndexedSeq[Map[String, Double]],
                          w: IndexedSeq[Double], k: Int): Map[(Int, String), Double] = {
    import spark.implicits._
    val exploded = cs.zipWithIndex.flatMap { case (v, i) =>
      v.map { case (t, x) => (i.toLong, w(i).toLong, t, x) }
    }.toDF("cand_idx", "w", "term", "v")
    KMeansParallel.reclusterRoundExact(exploded, k)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getString(1)) -> r.getDouble(2))
      .toMap
  }

  private def driver(cs: IndexedSeq[Map[String, Double]],
                     w: IndexedSeq[Double], k: Int): Map[(Int, String), Double] =
    // conv = 2.0 can never be reached (cosine <= 1), so maxIter = 1
    // yields exactly one weighted-mean round
    KMeansParallel.recluster(cs, w, k, conv = 2.0, maxIter = 1)
      .zipWithIndex
      .flatMap { case (v, c) => v.map { case (t, x) => (c, t) -> x } }
      .toMap

  test("one distributed round equals one driver round") {
    val got = distributed(cands, ws, k = 3)
    val want = driver(cands, ws, k = 3)
    assert(got.keySet == want.keySet)
    got.foreach { case (key, v) =>
      assert(math.abs(v - want(key)) < 1e-9, s"$key: $v vs ${want(key)}")
    }
  }

  test("empty cluster keeps its centroid vector in both paths") {
    // candidate 1 is a scalar multiple of candidate 0 -> cosine 1.0
    // with centroid 0, so centroid 1 (its own vector) goes memberless
    val dup = IndexedSeq(
      Map("a" -> 1.0, "b" -> 0.5),
      Map("a" -> 2.0, "b" -> 1.0),
      Map("c" -> 1.0))
    val w = IndexedSeq(1.0, 1.0, 1.0)
    val got = distributed(dup, w, k = 2)
    val want = driver(dup, w, k = 2)
    assert(got.keySet == want.keySet)
    got.foreach { case (key, v) =>
      assert(math.abs(v - want(key)) < 1e-9, s"$key: $v vs ${want(key)}")
    }
    // and the fallback really fired: cluster 1 == candidate 1 verbatim
    assert(got((1, "a")) == 2.0 && got((1, "b")) == 1.0)
  }
}
