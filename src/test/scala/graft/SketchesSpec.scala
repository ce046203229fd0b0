package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("union of per-shard sketches == one global sketch (mergeability)") {
    val ev = graft.io.Tables.events(spark, TestSession.sf)
      .select(col("event_type"), col("user_id"),
        (col("event_id") % 16).as("shard"))
    val merged = Sketches.estimate(Sketches.mergeSketches(
        Sketches.distinctSketch(ev, Seq("event_type", "shard"), "user_id"),
        Seq("event_type")))
      .select("event_type", "approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val global = Sketches.estimate(
        Sketches.distinctSketch(ev, Seq("event_type"), "user_id"))
      .select("event_type", "approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == global,
      "merging shard partials must equal the single-pass sketch")
  }

  test("estimates are within 5% of exact distinct counts") {
    val ev = graft.io.Tables.events(spark, TestSession.sf)
    val approx = Sketches.estimate(
        Sketches.distinctSketch(ev, Seq("event_type"), "user_id"))
      .select("event_type", "approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx $a vs exact $n")
    }
  }

  test("hll coupon regime: fine-granularity cells estimate exactly, any partitioning") {
    // the q103 anchor claim: below coupon-list promotion the sketch
    // IS the distinct set, so estimates equal COUNT(DISTINCT) and are
    // invariant to how partials were partitioned before the merge
    val ev = graft.io.Tables.events(spark, TestSession.sf)
      .withColumn("bucket", col("user_id") % 64)
    val exact = ev.groupBy("event_type", "bucket")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (parts <- Seq(1, 32)) {
      val est = Sketches.estimate(
          Sketches.distinctSketch(ev.repartition(parts),
            Seq("event_type", "bucket"), "user_id"))
        .select(col("event_type"), col("bucket"), col("approx_distinct"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(est == exact, s"parts=$parts: coupon-regime estimate not exact")
    }
  }

  test("hll set algebra: coupon-regime union/intersection equal exact set ops") {
    import spark.implicits._
    // sets A = {1..30}, B = {21..50} within one cell; |A∪B| = 50,
    // |A∩B| = 10 — register math + inclusion–exclusion, no raw data
    val df = ((1L to 30L).map(("A", 0L, _)) ++ (21L to 50L).map(("B", 0L, _)))
      .toSeq.toDF("seg", "cell", "uid")
    val out = Sketches.setAlgebra(
        Sketches.distinctSketch(df, Seq("seg", "cell"), "uid"), "seg", "cell")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_a") == 30L && r.getAs[Long]("n_b") == 30L)
    assert(r.getAs[Long]("n_union") == 50L)
    assert(r.getAs[Long]("n_inter") == 10L)
  }

  test("rollingDistinct: range frame counts clock hours across an empty-hour gap") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")
    // users 1..3 in hour 0, 3..5 in hour 1, hour 2 EMPTY, 9 in hour 3
    val df = (Seq(1L, 2L, 3L).map(u => ("k", ts(0), u)) ++
        Seq(3L, 4L, 5L).map(u => ("k", ts(1), u)) ++
        Seq(9L).map(u => ("k", ts(3), u)))
      .toDF("k", "t", "u")
    val out = Sketches.rollingDistinct(df, "k", "t", "u", hours = 2)
      .collect().map(r => r.getAs[Long]("hr") -> r.getAs[Long]("rolling_distinct"))
      .toMap
    val h0 = out.keys.min
    assert(out(h0) == 3L)
    assert(out(h0 + 1) == 5L, "union of hours 0+1 = {1..5}")
    // hour 3's 2-hour window covers hours 2..3; hour 2 is empty → just {9}
    assert(out(h0 + 3) == 1L,
      "RANGE frame must not stretch across the empty hour")
    // the exact bitmap-window path agrees cell-for-cell here (and
    // stays exact at cardinalities where HLL's coupon space can
    // collide — why q247 declares the bitmap variant)
    val exact = Sketches.rollingDistinctExact(df, "k", "t", "u", hours = 2)
      .collect().map(r => r.getAs[Long]("hr") -> r.getAs[Long]("rolling_distinct"))
      .toMap
    assert(exact == out, s"bitmap vs hll small-regime: $exact vs $out")
  }

  test("count-min collision-free regime: estimates == exact counts, any partitioning") {
    // the q106 anchor claim: with #distinct << width no key collides
    // in all depth rows, so the (always >=) estimate is exact — and
    // the sketch build is merge-order invariant
    val ev = graft.io.Tables.events(spark, TestSession.sf)
      .select(pmod(col("user_id"), lit(100)).cast("long").as("bucket"))
    val exact = ev.groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 32)) {
      val got = Sketches.countMinEstimates(ev.repartition(parts), "bucket")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exact, s"parts=$parts: CMS not exact in collision-free regime")
    }
  }

  test("count-min guarantee outside the exact regime: overcount only, bounded") {
    import spark.implicits._
    // 5000 distinct keys vs width 40 (eps 0.05): collisions guaranteed
    val df = (1L to 5000L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k)).toDF("k")
    val n = df.count()
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Sketches.countMinEstimates(df, "k", eps = 0.05, confidence = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (k, est) => est >= exact(k) },
      "CMS must never undercount")
    val within = got.count { case (k, est) => est - exact(k) <= (0.05 * n).toLong }
    assert(within >= (got.size * 0.9).toInt,
      s"eps*N overcount bound should hold at >=90% confidence, held for $within/${got.size}")
  }

  test("space-saving exact regime: capacity >= distinct == GROUP BY count, any partitioning") {
    import spark.implicits._
    val terms = graft.io.Tables.documents(spark, TestSession.sf)
      .select(explode(split(col("text"), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val exact = terms.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = exact.size // return the whole vocabulary
    for (parts <- Seq(1, 7, 32)) {
      val agg = udaf(new graft.functions.FreqItemsAggregator(256, k))
      val got = terms.repartition(parts).agg(agg(col("term")).as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t._1"), col("t._2"), col("t._3")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.forall(_._3 == 0L), s"parts=$parts: err must be 0 in the exact regime")
      assert(got.map(t => t._1 -> t._2).toMap == exact, s"parts=$parts: counts diverge")
    }
  }

  test("space-saving approximate regime: classic bounds hold under eviction") {
    import spark.implicits._
    // skewed stream: key i appears ~N/i times (zipf-ish), far more
    // distinct keys (40) than capacity (8)
    val data = (1 to 40).flatMap(i => Seq.fill(1200 / i)(s"k$i"))
    val n = data.size.toLong
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val capacity = 8
    val agg = udaf(new graft.functions.FreqItemsAggregator(capacity, capacity))
    val got = data.toDF("term").repartition(5)
      .agg(agg(col("term")).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t._1"), col("t._2"), col("t._3")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (key, est, err) =>
      val t = truth(key)
      assert(est >= t, s"$key: estimate $est must overcount true $t")
      assert(est - err <= t, s"$key: est-err ${est - err} must undercount true $t")
    }
    // every key with true count > n/capacity survives in the summary
    val heavy = truth.filter(_._2 > n / capacity).keySet
    val kept = got.map(_._1).toSet
    assert(heavy.subsetOf(kept), s"missing heavy hitters: ${heavy -- kept}")
  }

  test("bitmapDistinct: equals count(distinct) across chunk boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // ids straddle several 64Ki chunks, with duplicates
    val ids = Seq.fill(5000)(rnd.nextInt(300000).toLong) ++
      Seq(0L, 65535L, 65536L, 131071L, 131072L)
    val bd = udaf(new graft.functions.BitmapDistinctAggregator,
      org.apache.spark.sql.Encoders.scalaLong)
    val got = ids.toDF("id").repartition(7)
      .agg(bd(col("id")).as("n")).collect().head.getLong(0)
    assert(got == ids.distinct.size.toLong)
  }

  test("bitmapDistinct: grouped result is partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(2000)((rnd.nextInt(4).toString, rnd.nextInt(100000).toLong))
    val bd = udaf(new graft.functions.BitmapDistinctAggregator,
      org.apache.spark.sql.Encoders.scalaLong)
    def run(p: Int) = rows.toDF("g", "id").repartition(p)
      .groupBy(col("g")).agg(bd(col("id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    assert(run(1) == want && run(13) == want)
  }

  // ---- portable (oracle-replayable) HLL, round 9 --------------------

  test("portable HLL: registers match a scalar reference implementation") {
    import spark.implicits._
    val ids = (1L to 500L).map(_ * 37 % 1009)
    val regs = Sketches.portableHllRegisters(
        ids.toDF("id").withColumn("g", lit("a")), Seq("g"), "id", lgK = 12)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    // reference: same md5-prefix hash, bucket, rho — computed scalar
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = scala.collection.mutable.Map.empty[Long, Int]
    ids.distinct.foreach { v =>
      val hex = md.digest(v.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = h % 4096
      val w = h / 4096
      val rho = if (w == 0) 49 else 49 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      want(bucket) = math.max(want.getOrElse(bucket, 0), rho)
    }
    assert(regs == want.toMap, "register table must replay exactly")
  }

  test("portable HLL: estimate within 5% of exact; shard merge == global") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(20000)(
      (rnd.nextInt(3).toString, rnd.nextInt(5000).toLong, rnd.nextInt(16)))
    val df = rows.toDF("g", "id", "shard")
    val exact = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    val global = Sketches.portableHllEstimate(
        Sketches.portableHllRegisters(df, Seq("g"), "id"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    global.foreach { case (g, est) =>
      assert(math.abs(est - exact(g)) / exact(g) < 0.05,
        s"group $g: est $est vs exact ${exact(g)}")
    }
    // shard partials max-merged == the single global register table
    val sharded = Sketches.portableHllRegisters(df, Seq("g", "shard"), "id")
      .groupBy(col("g"), col("bucket")).agg(max(col("reg")).as("reg"))
    val merged = Sketches.portableHllEstimate(sharded, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(merged == global, "register max-merge must be lossless")
  }

  // ---- kmvDistinct (q340) — bottom-k order-statistic sketch ----

  /** The engine's portable 60-bit hash, recomputed independently. */
  private def h60(v: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def kmvRef(ids: Seq[Long], k: Int): (Long, Long, Long) = {
    val hs = ids.distinct.map(i => h60(i.toString)).sorted.take(k)
    val n = hs.length.toLong
    val kth = if (hs.isEmpty) 0L else hs.last
    val est = if (n < k) n
      else (BigInt(k - 1) * (BigInt(1) << 60) / BigInt(kth)).toLong
    (n, kth, est)
  }

  test("kmvDistinct: exact below k (duplicates never occupy slots), " +
    "replayable estimate above k, both equal to the hash-level ref") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // group 'small': 40 distinct ids duplicated 25× each (< k=64 → exact)
    // group 'big': 2000 distinct ids (> k → order-statistic estimate)
    val rows = ((1 to 1000).map(_ => ("small", rnd.nextInt(40).toLong)) ++
      (1 to 4000).map(_ => ("big", rnd.nextInt(100000).toLong))).toList
    val df = rows.toDF("g", "id")
    val got = Sketches.kmvDistinct(df, Seq("g"), "id", k = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val smallIds = rows.filter(_._1 == "small").map(_._2)
    val bigIds = rows.filter(_._1 == "big").map(_._2)
    assert(got("small") == kmvRef(smallIds, 64))
    assert(got("small")._3 == smallIds.distinct.size.toLong,
      "below-k estimate must be the exact distinct count")
    assert(got("big") == kmvRef(bigIds, 64))
    // sanity: the estimator lands near the truth (1/√62 ≈ 13% @ 3σ)
    val exactBig = bigIds.distinct.size.toLong
    assert(math.abs(got("big")._3 - exactBig).toDouble / exactBig < 0.4)
  }

  test("kmvDistinct: partition/merge-order invariance (mergeable partials)") {
    import spark.implicits._
    val rows = (1 to 5000).toList.map(i => ("g", (i * 2654435761L) % 1200))
    val a = Sketches.kmvDistinct(rows.toDF("g", "id"), Seq("g"), "id", 128)
      .collect().map(_.toSeq).toSeq
    val b = Sketches.kmvDistinct(rows.toDF("g", "id").repartition(17),
        Seq("g"), "id", 128)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("KmvAggregator.estimate is total: h_k = 0 and tiny h_k clamp to " +
    "Long.MaxValue instead of throwing / wrapping negative") {
    import graft.functions.KmvAggregator.estimate
    // degenerate saturated sketch whose k-th order statistic is 0
    assert(estimate(Seq(0L, 0L), k = 2) == Long.MaxValue)
    // h_k = 30 at k = 256: 255·2⁶⁰/30 ≈ 9.8e18 exceeds Long.MaxValue —
    // must clamp, never convert a >63-bit BigInt to a negative long
    val tiny = Seq.fill(255)(0L) :+ 30L
    assert(estimate(tiny, k = 256) == Long.MaxValue)
    // ordinary regime unchanged: h_k = 2⁶⁰ estimates exactly k−1
    assert(estimate(Seq(1L, 1L << 60), k = 2) == 1L)
  }

  test("kmvSetAlgebra: exact regime equals true set algebra; saturated " +
    "regime matches the hash-level reference and lands near truth") {
    import spark.implicits._
    // exact regime: 60 ids split A = {0..39}, B = {20..59}
    val small = (0L until 60L).toList.toDF("id")
      .withColumn("a", col("id") < 40L).withColumn("b", col("id") >= 20L)
    val r = Sketches.kmvSetAlgebra(small, "id", col("a"), col("b"), k = 256)
      .collect().head
    assert(r.getAs[Long]("n_u_kept") == 60L)
    assert(r.getAs[Long]("est_a") == 40L && r.getAs[Long]("est_b") == 40L)
    assert(r.getAs[Long]("est_union") == 60L)
    assert(r.getAs[Long]("jacc_num") == 20L)
    assert(r.getAs[Long]("est_inter") == 20L)
    assert(math.abs(r.getAs[Double]("jaccard9") - 20.0 / 60.0) < 1e-9)
    // saturated regime: 6000 ids, A = 2/3, B = 2/3, Jaccard = 1/2
    val big = (0L until 6000L).toList.toDF("id")
      .withColumn("a", col("id") % 3 =!= 0L)
      .withColumn("b", col("id") % 3 =!= 1L)
    val rb = Sketches.kmvSetAlgebra(big, "id", col("a"), col("b"), k = 128)
      .collect().head
    // hash-level reference of the same estimator
    val hs = (0L until 6000L).map(i => i -> h60(i.toString)).toMap
    def bottom(ids: Seq[Long]) = ids.map(hs).sorted.take(128)
    val ka = bottom((0L until 6000L).filter(_ % 3 != 0))
    val kb = bottom((0L until 6000L).filter(_ % 3 != 1))
    val ku = bottom((0L until 6000L).filter(i => i % 3 != 0 || i % 3 != 1))
    val jn = ku.count(x => ka.contains(x) && kb.contains(x)).toLong
    assert(rb.getAs[Long]("jacc_num") == jn)
    // the 128-sample estimate lands near the planted 1/3... truth here:
    // |A∩B| = ids with id%3==2 → 2000; |A∪B| = 6000 → J = 1/3
    assert(math.abs(rb.getAs[Double]("jaccard9") - 1.0 / 3.0) < 0.15)
    val estI = rb.getAs[Long]("est_inter")
    assert(estI > 1000L && estI < 3000L, s"est_inter $estI")
  }
}
