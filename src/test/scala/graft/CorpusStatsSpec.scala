package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.CorpusStats

class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("klDivergence: identical sources → 0; a skewed source diverges") {
    val docs = Seq(
      ("a", "x y"), ("a", "x y"),    // a: x,y equally
      ("b", "x y"),                  // b: same mix → same dist as corpus? no —
      ("c", "x x x x")               // c: all-x skews the corpus
    ).toDF("source", "text")
    val got = CorpusStats.klDivergence(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // c is pure x; corpus is 7x/3y → KL(c) = ln(10/7) > 0
    assert(math.abs(got("c") - math.log(10.0 / 7)) < 1e-6)
    assert(got("a") == got("b"), "identical distributions get identical KL")
    assert(got("a") > 0, "a differs from the x-heavy corpus")
  }

  test("klDivergence: a single source equals the corpus → KL exactly 0") {
    val docs = Seq(("only", "p q r p")).toDF("source", "text")
    val got = CorpusStats.klDivergence(docs, "source", "text").collect()
    assert(got.length == 1 && got.head.getDouble(3) == 0.0)
    assert(got.head.getLong(1) == 3L) // p, q, r
  }

  test("hrwShards: deterministic, total, and minimal remap on shard removal") {
    val docs = (1L to 200L).map(Tuple1(_)).toDF("doc_id")
    val s8 = (0 until 8).map(i => s"shard$i")
    val a = CorpusStats.hrwShards(docs, "doc_id", s8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = CorpusStats.hrwShards(docs, "doc_id", s8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "assignment is a pure function of (key, shard set)")
    assert(a.values.toSet.subsetOf(s8.toSet) && a.size == 200)
    // remove one shard: ONLY keys that were on it may move (HRW property)
    val s7 = s8.filterNot(_ == "shard3")
    val c = CorpusStats.hrwShards(docs, "doc_id", s7)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = a.filter { case (k, v) => c(k) != v }
    assert(moved.values.toSet == Set("shard3"),
      s"only shard3's keys remap, got movers from ${moved.values.toSet}")
    assert(moved.nonEmpty, "shard3 held some keys out of 200")
  }

  test("tokenFertility: exact totals and ratio on a hand-built corpus") {
    val docs = Seq(
      ("en", "ab cd"),   // 5 chars, 2 tokens
      ("en", "efg"),     // 3 chars, 1 token
      ("de", "hi")       // 2 chars, 1 token
    ).toDF("lang", "text")
    val got = CorpusStats.tokenFertility(docs, "lang", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("en") == ((2L, 3L, 8L, math.rint(8.0 / 3 * 1e6) / 1e6)))
    assert(got("de") == ((1L, 1L, 2L, 2.0)))
  }
}
