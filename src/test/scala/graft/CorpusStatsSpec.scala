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

  test("lengthCurriculum: stages are monotone in length and cover 0..k-1") {
    val docs = (1L to 100L).map(i => (i, i * 10)).toDF("doc_id", "n_chars")
    val got = CorpusStats.lengthCurriculum(docs, "doc_id", "n_chars", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    val byId = got.toMap
    assert(got.map(_._2).distinct.sorted.toSeq == (0L to 9L))
    // monotone: longer docs never get a lower stage
    val sorted = got.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    assert(byId(1L) == 0L && byId(100L) == 9L)
  }

  test("temperatureMixture: sqrt weights allocate closer to uniform than counts") {
    // s0: 90 docs, s1: 40 docs, draw 50. Proportional → ≈35/15;
    // sqrt-temperature → √90:√40 ≈ 30/20 (worked largest-remainder:
    // base 30/19, the leftover goes to s1's larger remainder).
    val docs = ((1L to 90L).map(i => ("s0", i)) ++
      (91L to 130L).map(i => ("s1", i))).toDF("source", "doc_id")
    val got = CorpusStats.temperatureMixture(docs, "source", "doc_id",
        total = 50L, invTemp = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("s0") + got("s1") == 50L, "largest remainder is exact-total")
    assert(got("s0") == 30L && got("s1") == 20L)
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

  test("rankNormalize ≡ the row-level rank()/percent_rank() window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i =>
      (i, s"g${i % 3}", rnd.nextInt(40).toLong)) :+ (301L, "solo", 9L)
    val df = rows.toDF("id", "g", "v")
    val got = CorpusStats.rankNormalize(df, "g", "v")
      .select("id", "rank", "n", "pct_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val w = Window.partitionBy("g").orderBy("v")
    val want = df
      .withColumn("rank", rank().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("pct_rank", when(col("n") === 1L, lit(0.0))
        .otherwise(round((col("rank") - 1L).cast("double") /
          (col("n") - 1L).cast("double"), 9)))
      .select("id", "rank", "n", "pct_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.find(_._1 == 301L).get._4 == 0.0, "singleton group → 0.0")
  }

  test("ksDrift: identical halves → 0, disjoint supports → 1, hand case exact") {
    import spark.implicits._
    // halves 1..50 / 51..100 give the same v = i%10 histogram
    val same = (1L to 100L).map(i => (i % 10, i <= 50))
      .toDF("v", "isA")
    val r0 = CorpusStats.ksDrift(same, "v", col("isA"), !col("isA"))
      .collect().head
    assert(r0.getLong(2) == 0L && r0.getDouble(3) == 0.0,
      "same per-value counts → D = 0")
    val disjoint = ((1L to 30L).map(v => (v, true)) ++
      (100L to 150L).map(v => (v, false))).toDF("v", "isA")
    val r1 = CorpusStats.ksDrift(disjoint, "v", col("isA"), !col("isA"))
      .collect().head
    assert(r1.getDouble(3) == 1.0, "disjoint supports → D = 1")
    // A = {1,2}, B = {2,3}: CDF gap peaks at v=1: |1·2 − 0·2| = 2 → ½
    val hand = Seq((1L, true), (2L, true), (2L, false), (3L, false))
      .toDF("v", "isA")
    val r2 = CorpusStats.ksDrift(hand, "v", col("isA"), !col("isA"))
      .collect().head
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getDouble(3)) ==
      ((2L, 2L, 2L, 0.5)))
  }

  test("zipfFit: a planted 1/rank corpus fits slope ≈ −1, repartition-invariant") {
    import spark.implicits._
    // term k appears ⌊240/k⌋ times → freq ∝ 1/rank by construction
    val words = (1 to 24).flatMap(k => Seq.fill(240 / k)(f"term$k%02d"))
    val docs = words.grouped(40).map(_.mkString(" ")).toSeq.toDF("text")
    val r = CorpusStats.zipfFit(docs, "text", k = 24).collect().head
    val slope = r.getDouble(6)
    assert(slope < -0.9 && slope > -1.1, s"Zipf slope ≈ −1, got $slope")
    val r2 = CorpusStats.zipfFit(docs.repartition(7), "text", k = 24)
      .collect().head
    assert(r == r2, "exact sums ⇒ partitioning-invariant fit")
  }

  test("psiDrift: identical slices score 0, a shifted slice scores positive") {
    // group 'same': A and B draw the identical value multiset → every
    // cell has ca == cb and na == nb → contrib exactly 0.
    // group 'shift': B's values displaced upward → psi > 0.
    val rows =
      (0 until 100).map(i => ("same", (i % 10).toLong, i < 50)) ++
        (0 until 100).map(i =>
          if (i < 50) ("shift", (i % 10).toLong, true)
          else ("shift", (i % 10 + 7).toLong, false))
    val df = rows.toDF("g", "v", "inA")
    val out = CorpusStats.psiDrift(df, "g", "v",
        inA = col("inA"), inB = !col("inA"))
      .select(col("g"), col("psi9")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("same") == 0L, s"identical slices: psi9=${out("same")}")
    assert(out("shift") > 100000000L, // psi > 0.1
      s"shifted slice: psi9=${out("shift")}")
    val out2 = CorpusStats.psiDrift(df.repartition(7), "g", "v",
        inA = col("inA"), inB = !col("inA"))
      .select(col("g"), col("psi9")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == out2, "scaled-long contributions ⇒ partition-invariant")
  }

  test("mergeDelta: existing ids frozen, new keys appended past max in order") {
    import spark.implicits._
    val existing = Seq(("apple", 1L), ("pear", 2L)).toDF("term", "id")
    val batch = Seq("pear", "cherry", "apple", "banana").toDF("term")
    val out = graft.text.Dictionary.mergeDelta(existing, batch, "term")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("id"), r.getAs[Long]("is_new"))).toMap
    assert(out == Map(
      "apple" -> (1L, 0L), "pear" -> (2L, 0L),
      "banana" -> (3L, 1L), "cherry" -> (4L, 1L)), out.toString)
  }

  // ---- quantileAlign (q362) ----

  private def runQa(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    graft.ops.CorpusStats.quantileAlign(
        rows.toDF("src", "id", "v"), "src", "id", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
  }

  test("quantileAlign: hand mapping — unequal groups, extremes to extremes") {
    // pooled sorted: [1,5,6,7,8,100] → positions 1..6
    val rows = Seq(("a", 1L, 1L), ("a", 2L, 100L),
      ("b", 3L, 5L), ("b", 4L, 6L), ("b", 5L, 7L), ("b", 6L, 8L))
    val got = runQa(rows)
    // a (n_g=2): rk1→⌈6/2⌉=3→6; rk2→6→100
    // b (n_g=4): rk1→2→5; rk2→3→6; rk3→⌈18/4⌉=5→8; rk4→6→100
    assert(got == Map(1L -> 6L, 2L -> 100L,
      3L -> 5L, 4L -> 6L, 5L -> 8L, 6L -> 100L))
  }

  test("quantileAlign: identical marginals are a fixed point; 1-row group → pooled max") {
    val same = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 10L), ("b", 5L, 20L), ("b", 6L, 30L))
    val got = runQa(same)
    same.foreach { case (_, id, v) => assert(got(id) == v, s"id $id") }
    val single = runQa(Seq(("a", 1L, 3L), ("a", 2L, 9L), ("lone", 9L, 4L)))
    assert(single(9L) == 9L, "a 1-row group sits at p=1 → pooled max")
  }

  test("quantileAlign: invariant to partitioning (distributed rank path)") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (s"s${i % 7}", i, i * 13 % 97))
    val a = graft.ops.CorpusStats.quantileAlign(
        rows.toDF("src", "id", "v"), "src", "id", "v")
      .collect().map(r => (r.getLong(1), r.getLong(3))).sortBy(_._1).toSeq
    val b = graft.ops.CorpusStats.quantileAlign(
        rows.toDF("src", "id", "v").repartition(13), "src", "id", "v")
      .collect().map(r => (r.getLong(1), r.getLong(3))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
