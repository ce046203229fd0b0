package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** AQE skew-join handling for the banded candidate joins (q29's hot
  * band, VERDICT r4 follow-up): the SimHash/LSH band joins are plain
  * shuffle equi-joins on (band, key), which is exactly the shape
  * Spark's adaptive OptimizeSkewedJoin knows how to split — a hot
  * bucket (q29's 2,251-doc band at sf0.1 is corpus-template skew)
  * becomes several sub-partitions at runtime, no salting needed.
  *
  * The test reproduces the shape synthetically (one key holding ~50%
  * of the left side), drops the skew thresholds to test scale, and
  * asserts the executed adaptive plan actually split the hot
  * partition. At 100 TB the same mechanism fires with the DEFAULT
  * thresholds (256 MB partition, 5× median); nothing in the dedup
  * operators blocks it — no cached plan pinning partitioning
  * (canChangeCachedPlanOutputPartitioning is set session-wide), no
  * manual repartition after the band explode.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def withConf[A](kvs: (String, String)*)(f: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("the band-join shape splits its hot bucket under AQE skew join") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: production keeps the defaults (256 MB /
      // 5x median); here the hot partition is ~MBs, so shrink both
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // the small side would broadcast (the OTHER valid skew remedy);
      // force the sort-merge path to exercise the splitter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "16") {
      import spark.implicits._
      // left: 400k rows, half on the hot key 0 — the "2,251 docs in
      // one band bucket" profile, exaggerated; some payload width so
      // the hot partition clears the byte threshold
      val left = spark.range(400000).select(
        when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(1000L))).as("key"),
        concat(lit("payload_"), col("id")).as("pl"))
      val right = spark.range(1000).select(col("id").as("key"),
        col("id").as("rv"))
      // downstream must NOT reuse the join-key partitioning — Spark
      // refuses to split a skewed join whose output distribution a
      // later stage depends on. The dedup queries have the same
      // property: after the band join they verify + distinct on
      // (id_a, id_b), a different key than (band, key).
      // the aggregate must consume the payload column, or column
      // pruning drops it before the exchange and the hot partition is
      // a few KB of bare keys — below any skew threshold
      val joined = left.join(right, Seq("key"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("key") === 0L, 1L).otherwise(0L)).as("hot"),
          sum(length(col("pl"))).as("pl_bytes"))
      val row = joined.collect().head
      // semantics unaffected by the split
      assert(row.getLong(0) == 400000L && row.getLong(1) == 200000L)
      assert(row.getLong(2) > 0L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.toLowerCase.contains("skewed"),
        s"expected a skew-split join in the adaptive plan:\n$plan")
    }
  }

  test("hybridJoin equals the plain join and routes heavy keys to broadcast") {
    import spark.implicits._
    // key 1 is the mega-key (500 rows); 2..50 hold 1-6 rows each
    val big = ((1 to 500).map(i => (1L, i.toLong)) ++
      (2L to 50L).flatMap(k => (0L until k % 7).map(i => (k, i))))
      .toDF("key", "payload")
    val small = (1L to 60L).map(k => (k, s"dim_$k")).toDF("key", "attr")
    val hybrid = graft.ops.Skew.hybridJoin(big, small, Seq("key"), heavyThreshold = 10L)
    val plain = big.join(small, Seq("key"))
    val h = hybrid.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val p = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(h == p)
    // plan: one broadcast join (heavy slice) + one non-broadcast join
    val plan = hybrid.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast path:\n$plan")
    // equality must hold at degenerate thresholds too (all-heavy /
    // all-light routing)
    for (t <- Seq(1L, 1000000L)) {
      val g = graft.ops.Skew.hybridJoin(big, small, Seq("key"), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      assert(g == p, s"threshold $t diverged")
    }
  }

  // ---- Skew.rendezvousAssign (q346) ----

  test("rendezvousAssign: matches an independent md5 argmax, minimal " +
    "movement on fleet growth, old shards never swap among themselves") {
    import spark.implicits._
    import graft.ops.Skew
    def h60(k: String, s: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$k:$s".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val keys = (1L to 2000L).toList
    val got = Skew.rendezvousAssign(keys.toDF("k"), col("k"), shards = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    keys.foreach { k =>
      val hs = (0 until 9).map(s => h60(k.toString, s))
      val old = (0 until 8).maxBy(s => (hs(s), -s))
      val nw = (0 until 9).maxBy(s => (hs(s), -s))
      assert(got(k) == ((old, nw, old != nw)), s"key $k")
      // HRW invariant: a key moves ONLY to the new shard, never
      // between old shards
      if (old != nw) assert(nw == 8, s"key $k moved old->old")
    }
    // expected movement ~ 1/9 of keys; allow a generous band
    val moved = got.values.count(_._3)
    assert(moved > 2000 / 9 / 2 && moved < 2000 / 9 * 2, s"moved=$moved")
  }
}
