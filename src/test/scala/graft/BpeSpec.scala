package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{BpeFunctions, BpeImpl}

/** Greedy BPE apply — the merge loop that the q115 anchor (empty
  * table ⇒ character count) deliberately does not exercise. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def enc(word: String, merges: (String, String)*): Seq[String] =
    BpeImpl.encodeWord(word, BpeImpl.buildRanks(merges)).toSeq

  test("classic fixture: low/lower under {l+o, lo+w}") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    assert(enc("low", merges: _*) == Seq("low"))
    assert(enc("lower", merges: _*) == Seq("low", "e", "r"))
    assert(enc("slow", merges: _*) == Seq("s", "low"))
  }

  test("rank priority decides between overlapping pairs") {
    // "abc": rank0 = a+b -> [ab, c]; with priorities swapped -> [a, bc]
    assert(enc("abc", ("a", "b"), ("b", "c")) == Seq("ab", "c"))
    assert(enc("abc", ("b", "c"), ("a", "b")) == Seq("a", "bc"))
  }

  test("merges cascade: products of earlier merges can merge again") {
    val merges = Seq(("a", "b"), ("c", "d"), ("ab", "cd"))
    assert(enc("abcd", merges: _*) == Seq("abcd"))
  }

  test("repeated characters merge left-to-right at equal rank") {
    // "aaaa" under a+a: positions 0 and 2 both rank 0; the leftmost
    // wins each round -> [aa, aa]
    assert(enc("aaaa", ("a", "a")) == Seq("aa", "aa"))
    // and the cascade to one token needs the second merge
    assert(enc("aaaa", ("a", "a"), ("aa", "aa")) == Seq("aaaa"))
  }

  test("unknown pairs terminate; empty table keeps characters") {
    assert(enc("xyz", ("q", "q")) == Seq("x", "y", "z"))
    assert(enc("xyz") == Seq("x", "y", "z"))
    assert(enc("") == Seq.empty)
  }

  /** In-memory reference trainer: same greedy semantics as
    * BpeTrainer.learnMerges, computed over a word list directly. */
  private def refLearn(words: Seq[String], k: Int): Seq[(String, String)] = {
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.length < k && !done) {
      val ranks = BpeImpl.buildRanks(merges)
      val counts = words.filter(_.length >= 2)
        .flatMap(w => BpeImpl.encodeWord(w, ranks).sliding(2).filter(_.length == 2))
        .map(p => (p(0), p(1))).groupBy(identity)
        .map { case (p, xs) => (p, xs.size.toLong) }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) done = true
      else {
        val best = eligible.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges = merges :+ best
      }
    }
    merges
  }

  test("distributed trainer equals the in-memory reference on a small corpus") {
    import spark.implicits._
    val docs = Seq("low low lower lowest", "slow slower low newest",
      "widest wider new low").toDF("text")
    val words = docs.collect().flatMap(_.getString(0).split("\\s+")).toSeq
    for (k <- Seq(1, 3, 6)) {
      val got = graft.ops.BpeTrainer.learnMerges(docs, "text", k)
      assert(got == refLearn(words, k), s"k=$k")
    }
  }

  test("incremental trainer equals the naive trainer and the in-memory reference") {
    import spark.implicits._
    val docs = Seq("low low lower lowest", "slow slower low newest",
      "widest wider new low").toDF("text")
    val words = docs.collect().flatMap(_.getString(0).split("\\s+")).toSeq
    for (k <- Seq(1, 3, 6, 10)) {
      val inc = graft.ops.BpeTrainer.learnMergesIncremental(docs, "text", k)
      assert(inc == refLearn(words, k), s"k=$k vs reference")
      assert(inc == graft.ops.BpeTrainer.learnMerges(docs, "text", k), s"k=$k vs naive")
    }
  }

  test("incremental trainer equals naive on real documents") {
    val docs = graft.io.Tables.documents(spark, TestSession.sf).limit(60)
    val k = 6
    val inc = graft.ops.BpeTrainer.learnMergesIncremental(docs, "text", k)
    val naive = graft.ops.BpeTrainer.learnMerges(docs, "text", k)
    assert(inc == naive)
  }

  test("mergeAdjacent: simultaneous left-to-right with skip") {
    import spark.implicits._
    val df = Seq(Seq("x", "x", "x"), Seq("x", "x", "x", "x"),
      Seq("a", "b", "a", "b"), Seq("b", "a")).toDF("t")
    val got = df.select(BpeFunctions.mergeAdjacent(col("t"), "x", "x").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("xx", "x"), List("xx", "xx"),
      List("a", "b", "a", "b"), List("b", "a")))
    val ab = df.select(BpeFunctions.mergeAdjacent(col("t"), "a", "b").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(ab == List(List("x", "x", "x"), List("x", "x", "x", "x"),
      List("ab", "ab"), List("b", "a")))
  }

  test("trainer merges monotonically shrink the corpus token count") {
    import spark.implicits._
    val docs = graft.io.Tables.documents(spark, TestSession.sf).limit(100)
    val merges = graft.ops.BpeTrainer.learnMerges(docs, "text", 5)
    assert(merges.length == 5)
    val counts = (0 to merges.length).map { i =>
      docs.select(sum(BpeFunctions.bpeTokenCount(col("text"), merges.take(i))))
        .collect().head.getLong(0)
    }
    counts.sliding(2).foreach { case Seq(prev, next) =>
      assert(next < prev, s"merge must reduce tokens: $counts")
    }
  }

  test("column kernel: count over words, empty-table anchor equals char count") {
    import spark.implicits._
    val df = Seq((1L, "low lower  slow"), (2L, ""), (3L, "a")).toDF("id", "t")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val got = df.select(col("id"),
        BpeFunctions.bpeTokenCount(col("t"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // low=1, lower=3, slow=2 -> 6
    assert(got == Map(1L -> 6L, 2L -> 0L, 3L -> 1L))
    val anchor = df.select(col("id"),
        BpeFunctions.bpeTokenCount(col("t"), Nil).as("n"),
        length(regexp_replace(col("t"), "\\s", "")).cast("long").as("chars"))
      .collect()
    anchor.foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }
}
