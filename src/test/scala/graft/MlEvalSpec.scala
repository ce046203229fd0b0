package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MlEval

class MlEvalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def auc(rows: Seq[(Long, Boolean)]) =
    MlEval.aucExact(rows.toDF("score", "pos"), "score", "pos")
      .collect().head

  test("aucExact: perfect separation → 1.0; reversed → 0.0; ties → ½ credit") {
    assert(auc(Seq((3L, true), (4L, true), (1L, false), (2L, false)))
      .getDouble(3) == 1.0)
    assert(auc(Seq((1L, true), (2L, true), (3L, false), (4L, false)))
      .getDouble(3) == 0.0)
    // pos {1,2}, neg {1,3}: pairs (1,1)=½ (1,3)=0 (2,1)=1 (2,3)=0 → 1.5/4
    val r = auc(Seq((1L, true), (2L, true), (1L, false), (3L, false)))
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 3L, "doubled numerator keeps ties integral")
    assert(r.getDouble(3) == 0.375)
  }

  test("aucExact: invariant to partitioning (distributed prefix scan)") {
    val rows = (1L to 500L).map(i => (i * 7 % 97, i % 3 == 0))
    val a = MlEval.aucExact(rows.toDF("score", "pos"), "score", "pos")
      .collect().head
    val b = MlEval.aucExact(rows.toDF("score", "pos").repartition(17),
      "score", "pos").collect().head
    assert(a == b)
  }

  test("ldpRandomizedResponse: flips follow the md5 draw; debias exact") {
    // derive the expected flip set from the same public hash the op uses
    def flips(id: Long): Boolean =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString < "4000"
    val units = (0L until 200L).map(i => (i, i % 3 == 0, i % 4))
    val got = MlEval.ldpRandomizedResponse(
      units.toDF("id", "truth", "cohort"), "id", "truth", "cohort")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val exp = units.groupBy(_._3).map { case (c, rows) =>
      val n = rows.size.toLong
      val tp = rows.count(_._2).toLong
      val obs = rows.count(r => r._2 ^ flips(r._1)).toLong
      c -> (n, tp, obs,
        tp.toDouble / n.toDouble,
        (obs * 65536L - n * 16384L).toDouble / (n * 32768L).toDouble)
    }
    assert(got == exp)
    // the mechanism must actually flip someone on this fixture (p=¼)
    assert(got.values.map(_._3).sum != got.values.map(_._2).sum)
  }

  test("ldpRandomizedResponse: near-zero flip prob recovers the truth") {
    // p = 1/65536: no id in this small fixture draws below '0001'
    val units = (1L to 50L).map(i => (i, i <= 20L, 0L))
    val r = MlEval.ldpRandomizedResponse(
      units.toDF("id", "truth", "cohort"), "id", "truth", "cohort", "0001")
      .collect().head
    assert(r.getLong(2) == 20L && r.getLong(3) == 20L)
    // debias with flips=1: (20·65536 − 50)/(50·65534) — exact IEEE
    assert(r.getDouble(5) ==
      (20L * 65536L - 50L).toDouble / (50L * 65534L).toDouble)
    intercept[IllegalArgumentException] {
      MlEval.ldpRandomizedResponse(
        units.toDF("id", "truth", "cohort"), "id", "truth", "cohort", "8000")
    }
    intercept[IllegalArgumentException] {
      MlEval.ldpRandomizedResponse(
        units.toDF("id", "truth", "cohort"), "id", "truth", "cohort", "XY")
    }
  }

  test("decisionStump: the perfect split earns the full root entropy") {
    // feature 1..100, positive iff f <= 50 → threshold 50 is pure
    val rows = (1L to 100L).map(i => (i, i <= 50L))
    val got = MlEval.decisionStump(rows.toDF("f", "pos"), "f", "pos", 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(5)))
      .toMap
    assert(got.contains(50L), s"deciles of 1..100 include 50, got ${got.keys}")
    assert(got(50L)._1 == 50L && got(50L)._2 == 50L)
    // root ent_sum9 = −2·50·ln9(½) = 100·693147181; children pure → 0
    assert(got(50L)._3 == 69314718100L)
    assert(got.values.map(_._3).max == got(50L)._3, "50 is the best split")
    // entropy gain is non-negative up to ln-rounding slack
    assert(got.values.forall(_._3 >= -10L))
  }

  test("rboHalf: identical → 1−2^-k ceiling, disjoint → 0, worked partial case") {
    def ranks(rows: (String, Long, Long)*) = rows.toSeq.toDF("g", "item", "rk")
    val ident = ranks(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L))
    val full = MlEval.rboHalf(ident, ident, "g", "item", "rk", k = 3)
      .collect().head
    // k=3: lcm=6, den=48; ceiling = 1 − 2^-3 = 42/48
    assert(full.getLong(2) == 42L && full.getLong(3) == 48L)
    assert(full.getDouble(4) == 0.875)
    val other = ranks(("g", 7L, 1L), ("g", 8L, 2L), ("g", 9L, 3L))
    val zero = MlEval.rboHalf(ident, other, "g", "item", "rk", k = 3)
      .collect().head
    assert(zero.getLong(1) == 0L && zero.getLong(2) == 0L
      && zero.getDouble(4) == 0.0)
    // one shared item at ranks (1, 2): contributes from depth 2 on:
    // F[2] = 2^1·(6/2) + 2^0·(6/3) = 8 → 8/48 = 1/6
    val partial = MlEval.rboHalf(ident,
      ranks(("g", 9L, 1L), ("g", 1L, 2L), ("g", 8L, 3L)),
      "g", "item", "rk", k = 3).collect().head
    assert(partial.getLong(1) == 1L && partial.getLong(2) == 8L)
  }

  test("theilSenSlope: outlier cannot move the median slope; OLS moves") {
    // y = 2x exactly, except one wild point
    val pts = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L), (5L, 1000L))
      .map { case (x, y) => ("k", x, y) }.toDF("k", "x", "y")
    val ts = MlEval.theilSenSlope(pts, "k", "x", "y").collect().head
    assert(ts.getLong(1) == 5L && ts.getLong(2) == 10L)
    assert(ts.getDouble(3) == 2.0, "median of pairwise slopes ignores the outlier")
    val ols = MlEval.olsTrend(pts, "k", "x", "y").collect().head
    assert(math.abs(ols.getDouble(6) - 2.0) > 10.0, "OLS dragged by the outlier")
  }

  test("theilSenSlope: lower median on even pair counts; dx=0 pairs skipped") {
    // points (1,1),(2,3),(3,4): slopes 2, 1.5, 1 → median 1.5
    val pts = Seq(("k", 1L, 1L), ("k", 2L, 3L), ("k", 3L, 4L))
      .toDF("k", "x", "y")
    assert(MlEval.theilSenSlope(pts, "k", "x", "y")
      .collect().head.getDouble(3) == 1.5)
    // duplicate x never pairs with itself: (1,1),(1,5),(2,2) →
    // slopes 1 and −3 only; lower median (rank (2+1) div 2 = 1) = −3
    val dup = Seq(("k", 1L, 1L), ("k", 1L, 5L), ("k", 2L, 2L))
      .toDF("k", "x", "y")
    val r = MlEval.theilSenSlope(dup, "k", "x", "y").collect().head
    assert(r.getLong(2) == 2L)
    assert(r.getDouble(3) == -3.0)
  }

  test("theilSenSlope: groups beyond the cap are dropped, not mis-fit") {
    val big = (1L to 30L).map(i => ("big", i, i)) ++
      Seq(("ok", 1L, 1L), ("ok", 2L, 2L))
    val got = MlEval.theilSenSlope(big.toDF("k", "x", "y"), "k", "x", "y",
      maxGroupSize = 10).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("ok"))
  }

  test("ndcgAtK: hand case with an out-of-top-k high-relevance candidate") {
    // k=3; system ranks b(rel1)=1, a(rel3)=2, c(rel0)=3; d(rel2) ranked 5
    // — d is outside the system top-3 but competes for the ideal top-3
    val df = Seq(("g", "a", 3L, 2L), ("g", "b", 1L, 1L), ("g", "c", 0L, 3L),
      ("g", "d", 2L, 5L)).toDF("g", "item", "rel", "rk")
    val w = MlEval.ndcgWeights9(3) // [1e9, 630929754, 5e8]
    assert(w == Seq(1000000000L, 630929754L, 500000000L))
    val r = MlEval.ndcgAtK(df, "g", "item", "rel", "rk", 3).collect().head
    val dcg = 1L * w(0) + 7L * w(1) // b at 1, a at 2, c gains 0
    val idcg = 7L * w(0) + 3L * w(1) + 1L * w(2) // ideal a, d, b
    assert(r.getLong(1) == dcg && r.getLong(2) == idcg)
    assert(r.getDouble(3) == BigDecimal(dcg.toDouble / idcg.toDouble)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ndcgAtK: perfect ranking → 1.0; all-zero relevance → 0.0") {
    val perfect = Seq(("g", "a", 3L, 1L), ("g", "b", 2L, 2L),
      ("g", "c", 1L, 3L)).toDF("g", "item", "rel", "rk")
    assert(MlEval.ndcgAtK(perfect, "g", "item", "rel", "rk", 3)
      .collect().head.getDouble(3) == 1.0)
    val zero = Seq(("g", "a", 0L, 1L), ("g", "b", 0L, 2L))
      .toDF("g", "item", "rel", "rk")
    assert(MlEval.ndcgAtK(zero, "g", "item", "rel", "rk", 3)
      .collect().head.getDouble(3) == 0.0)
  }

  test("calibrationBins: a perfectly separable score fills clean decile bins") {
    // scores 1..100, positive iff score > 50: bins 0-4 all-negative,
    // bins 5-9 all-positive; every bin holds exactly 10 rows
    val rows = (1L to 100L).map(i => (i, i > 50L))
    val got = MlEval.calibrationBins(rows.toDF("f", "pos"), "f", "pos", 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(6))).toMap
    assert(got.keySet == (0L to 9L).toSet)
    (0L to 9L).foreach { b =>
      assert(got(b)._1 == 10L, s"bin $b holds a decile")
      assert(got(b)._3 == (if (b >= 5) 1.0 else 0.0), s"bin $b purity")
    }
  }

  test("olsTrend: recovers an exact linear relation per group") {
    // group a: y = 3x + 7; group b: y = -2x + 100 — integer points fit
    // exactly, so slope/intercept come out bit-exact
    val rows = (1L to 50L).flatMap(x =>
      Seq(("a", x, 3 * x + 7), ("b", x, -2 * x + 100)))
    val got = MlEval.olsTrend(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> (r.getDouble(6), r.getDouble(7)))
      .toMap
    assert(got("a") == ((3.0, 7.0)) && got("b") == ((-2.0, 100.0)))
  }

  test("olsTrend: sums stay exact beyond Long range and survive repartitioning") {
    // x ~ 3e9 → Σx² per row ~ 1e19 > Long.MaxValue: the decimal
    // accumulator must not wrap or lose digits
    val rows = (1L to 200L).map(i => ("g", 3000000000L + i, i * 1000L))
    val df = rows.toDF("g", "x", "y")
    val a = MlEval.olsTrend(df, "g", "x", "y").collect().head
    val b = MlEval.olsTrend(df.repartition(13), "g", "x", "y").collect().head
    assert(a == b, "order-independent")
    val sxx = BigDecimal(a.getDecimal(5))
    val want = rows.map(r => BigDecimal(r._2) * BigDecimal(r._2)).sum
    assert(sxx == want, s"exact Σx²: $sxx vs $want")
    // the planted slope is 1000 per unit x
    assert(math.abs(a.getDouble(6) - 1000.0) < 1e-6)
  }

  import org.apache.spark.sql.functions.{col, round}

  test("weightedMedian: weight mass moves the boundary; unit weights = lower median") {
    // values 1..4 with weight 10 on value 4: half of tot=13 is 6.5 →
    // smallest v with cum·2 ≥ 13 is 4 (cum at 3 is 3)
    val skew = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 10L))
      .toDF("k", "v", "w")
    val r = MlEval.weightedMedian(skew, "k", col("v"), col("w")).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((4L, 13L)))
    // unit weights: even count takes the LOWER middle (2 of 1..4)
    val unit = (1L to 4L).map(v => ("g", v, 1L)).toDF("k", "v", "w")
    val u = MlEval.weightedMedian(unit, "k", col("v"), col("w")).collect().head
    assert(u.getLong(1) == 2L)
  }

  test("nearestScoreMatch: caliper cut, nearest pick, tie to min control id") {
    import graft.ops.Matching
    val treated = Seq((1L, 10L), (3L, 5L), (5L, 100L)).toDF("id", "s")
    val control = Seq((2L, 8L), (4L, 13L), (6L, 2L), (8L, 8L)).toDF("id", "s")
    val got = Matching.nearestScoreMatch(treated, control, "id", "s", caliper = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    // treated 1 (score 10): control 2 at |2| beats 4 at |3|; 8 ties 2
    // on diff → min control id wins
    assert(got(1L) == ((2L, 2L)))
    // treated 3 (score 5): controls 2 (|3|) and 8 (|3|) tie across a
    // bucket boundary → min id 2
    assert(got(3L) == ((2L, 3L)))
    // treated 5 (score 100): nothing within the caliper
    assert(!got.contains(5L))
  }

  test("mannWhitneyU: hand-computed doubled ranks with ties") {
    // group1 = {1,2,2}, group2 = {2,3}: tied block of three 2s gets
    // avg rank 3 → 2·R1 = 2 + 6 + 6 = 14, 2·U1 = 14 − 12 = 2
    val df = Seq((1L, true), (2L, true), (2L, true), (2L, false), (3L, false))
      .toDF("v", "g1")
    val r = MlEval.mannWhitneyU(df, col("v"), col("g1")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((3L, 2L, 14L, 2L, 10L)))
  }

  test("mannWhitneyU: U1 + U2 == n1·n2 and partition invariance on real data") {
    val ev = graft.io.Tables.events(spark, TestSession.sf)
      .filter(col("event_type").isin("click", "view"))
    def run(d: org.apache.spark.sql.DataFrame) =
      MlEval.mannWhitneyU(d, round(col("value") * 100).cast("long"),
        col("event_type") === "click").collect().head
    val a = run(ev)
    assert(a.getLong(3) + a.getLong(4) == 2L * a.getLong(0) * a.getLong(1))
    val b = run(ev.repartition(17))
    assert(a == b)
  }

  test("aucExactByGroup: per-group values equal global aucExact on each slice") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val g = i % 3
      val pos = rng.nextBoolean()
      // group 0: informative score; group 1: anti-informative; group 2: noise
      val s = g match {
        case 0 => (if (pos) 60 else 40) + rng.nextInt(20)
        case 1 => (if (pos) 40 else 60) + rng.nextInt(20)
        case _ => rng.nextInt(100)
      }
      (g.toLong, s.toLong, pos)
    }
    val df = rows.toDF("g", "score", "pos")
    val grouped = MlEval.aucExactByGroup(df, "g", "score", "pos")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("num2"), r.getAs[Double]("auc"))).toMap
    for (g <- 0L to 2L) {
      val single = MlEval.aucExact(df.filter(col("g") === g), "score", "pos")
        .collect().head
      assert(grouped(g)._1 == single.getAs[Long]("num2"),
        s"group $g integer statistic must equal the global kernel's")
      assert(grouped(g)._2 == single.getAs[Double]("auc"))
    }
    assert(grouped(0L)._2 > 0.7 && grouped(1L)._2 < 0.3)
  }

  test("poissonBootstrap: deterministic replicates, weights near Poisson(1), invariant") {
    import org.apache.spark.sql.functions._
    val df = (0 until 400).map(i => ("g", i.toLong, 100L + i % 7))
      .toDF("g", "id", "x")
    val out = MlEval.poissonBootstrap(df, "g", "id", "x", reps = 20)
      .orderBy(col("rep")).collect()
    assert(out.length == 20)
    // E[Σw] = n per replicate; across 20 reps the total stays near n
    val effs = out.map(_.getAs[Long]("n_eff"))
    assert(math.abs(effs.sum / 20.0 - 400.0) < 20.0, s"mean n_eff=${effs.sum / 20.0}")
    // replicate means stay near the true mean (100..106 → ~103)
    val means = out.map(_.getAs[Double]("mean9"))
    assert(means.forall(m => m > 100.0 && m < 106.0))
    assert(means.distinct.length > 1, "replicates must actually differ")
    val out2 = MlEval.poissonBootstrap(df.repartition(7), "g", "id", "x", 20)
      .orderBy(col("rep")).collect()
    assert(out.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq,
      "hash-derandomized weights must be partition-invariant")
  }

  test("isotonicCalibration: PAV merges the violating bins, fit is monotone") {
    import org.apache.spark.sql.functions.col
    // scores 1/2/3 × 10 rows; positive counts 4, 2, 6 → raw rates
    // 0.4, 0.2, 0.6 zig-zag; PAV pools bins 0,1 → 0.3, 0.3, 0.6
    val rows = (0 until 30).map { i =>
      val s = 1L + i / 10
      val pos = (i / 10) match {
        case 0 => i % 10 < 4
        case 1 => i % 10 < 2
        case _ => i % 10 < 6
      }
      (s, pos)
    }
    val out = MlEval.isotonicCalibration(rows.toDF("score", "pos"),
        "score", "pos", nBins = 3)
      .orderBy(col("bin")).collect()
    assert(out.length == 3)
    val fits = out.map(_.getAs[Double]("fit9")).toSeq
    assert(fits == Seq(0.3, 0.3, 0.6), fits.mkString(","))
    assert(fits == fits.sorted, "isotonic fit must be monotone")
    val rates = out.map(_.getAs[Double]("pos_rate9")).toSeq
    assert(rates == Seq(0.4, 0.2, 0.6))
  }

  // ---- krippendorffAlpha (q342) ----

  /** Textbook coincidence-matrix alpha in plain doubles. */
  private def kaRef(units: Seq[Seq[String]]): Option[Double] = {
    val pair = units.filter(_.length >= 2)
    var doNum = 0.0
    val nc = scala.collection.mutable.Map.empty[String, Long]
    var n = 0L
    pair.foreach { vs =>
      val m = vs.length
      val cnt = vs.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
      val agree = cnt.values.map(c => c * (c - 1)).sum
      doNum += (m.toLong * (m - 1) - agree).toDouble / (m - 1)
      cnt.foreach { case (c, x) => nc(c) = nc.getOrElse(c, 0L) + x }
      n += m
    }
    val de = (n * n - nc.values.map(c => c * c).sum).toDouble / (n - 1)
    if (de == 0.0) None
    else Some(BigDecimal(1.0 - doNum / de)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  private def kaRun(units: Seq[Seq[String]], maxRaters: Int = 4) = {
    val rows = units.zipWithIndex.flatMap { case (vs, u) =>
      vs.map(v => (u.toLong, v)) }
    MlEval.krippendorffAlpha(rows.toDF("u", "v"), "u", "v", maxRaters)
      .collect().head
  }

  test("krippendorffAlpha: perfect agreement is 1, uniform-category " +
    "panels are undefined (null), singleton units drop") {
    val perfect = kaRun(Seq(Seq("a", "a", "a"), Seq("b", "b"), Seq("a")))
    assert(perfect.getLong(0) == 2L && perfect.getLong(1) == 5L)
    assert(perfect.getLong(2) == 0L && perfect.getDouble(3) == 1.0)
    val uniform = kaRun(Seq(Seq("a", "a"), Seq("a", "a", "a")))
    assert(uniform.isNullAt(3), "De = 0 must yield null, not a value")
  }

  test("krippendorffAlpha: ragged multi-rater panel equals the textbook " +
    "coincidence formulation") {
    val rnd = new scala.util.Random(23)
    val cats = Seq("a", "b", "c")
    val units = (1 to 60).map { _ =>
      val m = 2 + rnd.nextInt(3) // 2..4 raters
      (1 to m).map(_ => cats(rnd.nextInt(cats.length)))
    }
    val r = kaRun(units)
    assert(Some(r.getDouble(3)) == kaRef(units))
    // disagreement dominates a 3-category random panel: alpha near 0
    assert(math.abs(r.getDouble(3)) < 0.25)
  }

  test("krippendorffAlpha: a unit above maxRaters fails fast") {
    val e = intercept[Exception] {
      kaRun(Seq(Seq("a", "b", "a", "b", "a")), maxRaters = 4)
    }
    assert(e.getMessage != null)
  }

  // ---- fellegiSunter (q343) ----

  test("fellegiSunter: hand-computed weights, exact long score sum, " +
    "agreement-pattern ranking") {
    import graft.ops.Matching
    // 4 pairs: t=4, agree_x in 2 of 4 (u=0.5), agree_y in 1 of 4 (u=0.25)
    val pairs = Seq(
      (1L, 1L, true, true),
      (2L, 2L, true, false),
      (3L, 4L, false, false),
      (4L, 3L, false, false))
      .toDF("a_key", "b_key", "agree_x", "agree_y")
    val out = Matching.fellegiSunter(pairs,
        Seq("agree_x" -> 0.75, "agree_y" -> 0.875))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Long]("score9")).toMap
    def w9(x: Double): Long =
      math.round(BigDecimal(math.log(x)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble * 1e9)
    val wxA = w9(0.75 / 0.5); val wxD = w9(0.25 / 0.5)
    val wyA = w9(0.875 / 0.25); val wyD = w9(0.125 / 0.75)
    assert(out((1L, 1L)) == wxA + wyA)
    assert(out((2L, 2L)) == wxA + wyD)
    assert(out((3L, 4L)) == wxD + wyD && out((4L, 3L)) == wxD + wyD)
    // more agreement strictly outranks less
    assert(out((1L, 1L)) > out((2L, 2L)) && out((2L, 2L)) > out((3L, 4L)))
  }

  test("fellegiSunter: degenerate empirical u (all or none agree) fails " +
    "fast instead of scoring ln(0)") {
    import graft.ops.Matching
    val allAgree = Seq((1L, 1L, true), (2L, 2L, true))
      .toDF("a_key", "b_key", "agree_x")
    val e = intercept[Exception] {
      Matching.fellegiSunter(allAgree, Seq("agree_x" -> 0.9375)).collect()
    }
    assert(e.getMessage != null)
  }

  // ---- cuped (q348) ----

  test("cuped: theta recovers a planted linear covariate, adjustment " +
    "removes the covariate imbalance, var ratio ~ 1 - rho^2") {
    // y = 2x exactly -> theta = 2, rho^2 = 1, var_ratio = 0, and the
    // adjusted means of both arms collapse to the same value even
    // though arm 1 got the larger-x units
    val units = (1L to 100L).map(i => (if (i <= 50) 0 else 1, i, 2 * i))
      .toList.toDF("arm", "x", "y")
    val got = MlEval.cuped(units, "arm", "x", "y")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(0).getAs[Double]("theta9") == 2.0)
    assert(got(0).getAs[Double]("var_ratio6") == 0.0)
    val adj0 = got(0).getAs[Double]("adj_mean6")
    val adj1 = got(1).getAs[Double]("adj_mean6")
    assert(adj0 == adj1, s"perfect covariate must equalize: $adj0 vs $adj1")
    // raw means differ wildly (25.5*2 vs 75.5*2); adjusted = pooled mean
    assert(got(0).getAs[Double]("mean_y6") == 51.0)
    assert(got(1).getAs[Double]("mean_y6") == 151.0)
    assert(adj0 == 101.0)
  }

  test("cuped: zero-correlation covariate leaves means untouched " +
    "(theta 0) and var ratio 1") {
    // x alternates independent of y within each arm
    val units = Seq((0, 1L, 10L), (0, 3L, 10L), (1, 1L, 20L), (1, 3L, 20L))
      .toDF("arm", "x", "y")
    val got = MlEval.cuped(units, "arm", "x", "y")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(0).getAs[Double]("theta9") == 0.0)
    assert(got(0).getAs[Double]("var_ratio6") == 1.0)
    assert(got(0).getAs[Double]("adj_mean6") == 10.0)
    assert(got(1).getAs[Double]("adj_mean6") == 20.0)
  }
}
