package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable frequency/distinct sketches via the Spark built-ins
  * (DataSketches HLL, Count-Min — codegen'd aggregation, no UDF in
  * the build path). The 100 TB story is MERGEABILITY: a sketch built
  * per shard/partition/day can be unioned later into any coarser
  * rollup without touching the raw data again, and the union equals
  * the sketch you'd have built in one global pass (asserted in
  * SketchesSpec). That makes distinct-count rollups an O(sketch-size)
  * metadata operation instead of a re-scan — the pre-aggregated-cube
  * pattern for COUNT(DISTINCT) — and point-frequency lookup an
  * O(width×depth) probe instead of a GROUP BY over the raw table.
  */
object Sketches {

  /** Executor-side probe wrapper: ships the serialized sketch once per
    * task closure, deserializes once per executor (transient lazy),
    * probes per row. */
  private class CmsProbe(bytes: Array[Byte]) extends Serializable {
    @transient private lazy val cms =
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    def estimate(k: Long): Long = cms.estimateCount(k)
  }

  /** Count-Min point-frequency estimates for every distinct value of
    * `keyCol` (must be integral). The sketch is built by Spark's
    * mergeable `count_min_sketch` aggregate — partial sketches
    * map-side, O(width×depth) state through the shuffle — then the
    * O(100 KB) result is fetched driver-side (1 row, the same O(1)
    * contract as a K-Means model) and probed per key.
    *
    * CMS guarantees estimate ≥ true count, with overestimate ≤ eps·N
    * at the given confidence; with #distinct ≪ width (2/eps) the
    * probability that any key collides in ALL depth rows is
    * negligible and the estimates are EXACTLY the true counts — the
    * collision-free regime, this family's oracle-green anchor (the
    * q103 coupon-regime trick applied to frequency instead of
    * cardinality). Everything is seed-deterministic either way.
    */
  def countMinEstimates(df: DataFrame, keyCol: String, eps: Double = 5e-4,
                        confidence: Double = 0.999, seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"countMinEstimates requires an integral keyCol; '$keyCol' is $other " +
          "(a non-integral column would hash in a different domain at build " +
          "vs probe time)")
    }
    // build and probe in the SAME domain: cast to long before sketching
    val keyed = df.select(col(keyCol).cast("long").as(keyCol))
    val bytes = keyed
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)))
      .first().getAs[Array[Byte]](0)
    val probe = udf(new CmsProbe(bytes).estimate _)
    keyed.distinct().withColumn("est", probe(col(keyCol)))
  }

  /** Per-group HLL sketch partials over `valueCol`. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge partial sketches up to a coarser key set (e.g. drop the
    * shard column) — no raw-data access. */
  def mergeSketches(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Attach the cardinality estimate. */
  def estimate(sketches: DataFrame): DataFrame =
    sketches.withColumn("approx_distinct",
      hll_sketch_estimate(col("sketch")).cast("long"))

  /** ROLLING DISTINCT via sketch-window rollup — the 24-hour sliding
    * COUNT(DISTINCT) answered from per-hour HLL cells instead of the
    * raw log: build one sketch per (key, hour) — O(sketch) state each
    * — then `hll_union_agg` over a 23-PRECEDING row window of the
    * tiny hourly-cell table. The raw data is touched once; the
    * window slides over cells, so a year of log at any volume costs
    * 8760 sketch merges per key, not 24 re-scans per hour. In the
    * coupon regime every rolling estimate is the exact distinct
    * count (the q103/q231 contract).
    *
    * @return (key, hr, rolling_distinct) per populated hour. */
  def rollingDistinct(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, hours: Int = 24,
                      lgK: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .select(col(keyCol).as("k"),
        expr(s"unix_micros(`$tsCol`) div 3600000000").as("hr"),
        col(valueCol).as("v"))
      .groupBy(col("k"), col("hr"))
      .agg(hll_sketch_agg(col("v"), lit(lgK)).as("sketch"))
    // RANGE frame on the hour index: 24 CLOCK hours — an empty hour
    // narrows the merge set instead of silently stretching the window
    val w = Window.partitionBy(col("k")).orderBy(col("hr"))
      .rangeBetween(-(hours - 1), Window.currentRow)
    cells
      .withColumn("rolling_distinct",
        hll_sketch_estimate(hll_union_agg(col("sketch")).over(w))
          .cast("long"))
      .select(col("k").as(keyCol), col("hr"), col("rolling_distinct"))
  }

  /** EXACT rolling distinct — the same sliding COUNT(DISTINCT) as
    * [[rollingDistinct]] but through the chunked-BITMAP aggregate
    * (q215's Roaring pattern) over the deduplicated (key, hour,
    * value) tuple table: the RANGE window re-merges exact bitmap
    * partials per frame, so the count is exact at ANY cardinality —
    * no coupon space to collide in. (The sf0.1 sweep caught the HLL
    * variant one-off at ~388 distinct per window: a coupon-space
    * birthday collision — approximate by design; THIS is the
    * declared-oracle path, the HLL one remains the
    * lower-memory approximation pinned by SketchesSpec.)
    *
    * Scale: the window runs over distinct (key, hour, value) tuples —
    * one dedup shuffle compresses the raw log; frames span `hours`
    * clock hours via the RANGE bound. */
  def rollingDistinctExact(df: DataFrame, keyCol: String, tsCol: String,
                           valueCol: String, hours: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bd = org.apache.spark.sql.functions.udaf(
      new graft.functions.BitmapDistinctAggregator,
      org.apache.spark.sql.Encoders.scalaLong)
    val u = df.select(col(keyCol).as("k"),
        expr(s"unix_micros(`$tsCol`) div 3600000000").as("hr"),
        col(valueCol).cast("long").as("v"))
      .distinct()
    val w = Window.partitionBy(col("k")).orderBy(col("hr"))
      .rangeBetween(-(hours - 1), Window.currentRow)
    u.withColumn("rolling_distinct", bd(col("v")).over(w))
      .select(col("k").as(keyCol), col("hr"), col("rolling_distinct"))
      .distinct()
  }

  /** SKETCH SET ALGEBRA over the per-cell sketches of
    * [[distinctSketch]]: for every pair of `keyCol` values within a
    * `cellCol` cell, |A|, |B|, |A∪B| straight from register math
    * (pairwise `hll_union`), and |A∩B| by inclusion–exclusion.
    * This is the audience-overlap / cross-segment-reach query — "how
    * many users did both A and B" — answered from O(sketch) state
    * with NO return to the raw data: the join runs over the tiny
    * cell×key sketch table, so overlap across any two of K segments
    * costs K²·sketch-size, not a re-scan of the event log.
    *
    * In the coupon regime (cell unions below k/4 at the chosen lgK)
    * every estimate is the exact distinct count — the oracle anchor,
    * same contract as the q103 cells. */
  def setAlgebra(cells: DataFrame, keyCol: String, cellCol: String)
      : DataFrame = {
    val a = cells.select(col(keyCol).as("k_a"), col(cellCol),
      col("sketch").as("sk_a"))
    val b = cells.select(col(keyCol).as("k_b"), col(cellCol),
      col("sketch").as("sk_b"))
    a.join(b, Seq(cellCol)).filter(col("k_a") < col("k_b"))
      .select(col("k_a"), col("k_b"), col(cellCol),
        hll_sketch_estimate(col("sk_a")).cast("long").as("n_a"),
        hll_sketch_estimate(col("sk_b")).cast("long").as("n_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .cast("long").as("n_union"))
      .withColumn("n_inter", col("n_a") + col("n_b") - col("n_union"))
  }

  /** PORTABLE HLL registers (Flajolet et al. 2007, the classic
    * HyperLogLog recurrence) over a cross-engine-replayable hash — the
    * q29/q32/q47 "portable md5" discipline applied to the sketch
    * family, so the ESTIMATION regime itself can sit under the DuckDB
    * oracle (the DataSketches path in [[distinctSketch]] stays the
    * production variant; its bytes aren't cross-engine).
    *
    * Hash = 60-bit md5 prefix of the value's string form; bucket = low
    * `lgK` bits' modulus, w = the remaining 60−lgK bits, rho(w) =
    * leading-zero rank in that window (w = 0 → width+1). Registers
    * are per-(group, bucket) MAX — associative and order-free, so
    * shard partials max-merge into any coarser rollup exactly like
    * the DataSketches union (and the oracle replays the same max).
    *
    * One shuffle: groupBy(groupCols :+ bucket) over a narrow hash
    * projection, partial-agg map-side. */
  def portableHllRegisters(df: DataFrame, groupCols: Seq[String],
                           valueCol: String, lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 16)
    val m = 1 << lgK
    val width = 60 - lgK // bits left for the rho window
    val h = conv(substring(md5(col(valueCol).cast("string").cast("binary")),
      1, 15), 16, 10).cast("long")
    df.withColumn("_h", h)
      .withColumn("bucket", pmod(col("_h"), lit(m.toLong)))
      .withColumn("_w", expr(s"_h div $m"))
      .withColumn("_rho",
        when(col("_w") === 0, lit(width + 1))
          .otherwise(lit(width + 1) - length(bin(col("_w")))))
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("_rho")).as("reg"))
  }

  /** KMV (bottom-k) distinct sketch per group — the
    * [[graft.functions.KmvAggregator]] over the portable 60-bit md5
    * hash of `valueCol`. The third member of the distinct-count
    * family: DataSketches HLL (rows-only in its approximate regime),
    * the portable-HLL registers (register-replayable), and now a
    * sketch whose ESTIMATE replays cross-engine even when
    * approximate — the k-th smallest distinct hash is a deterministic
    * order statistic and (k−1)·2⁶⁰ div h_k is exact integer math, so
    * DuckDB reproduces the estimate bit-for-bit at any cardinality.
    * Below k distinct values the sketch degenerates to the exact set.
    *
    * One partial-agg shuffle; O(k) state per group map-side and
    * through the wire; shard sketches merge into coarser rollups
    * without re-scanning (SketchesSpec pins partial ∪ = global).
    *
    * @return groupCols :+ (n_kept, kth_hash, est_distinct). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 256): DataFrame = {
    val h = conv(substring(md5(col(valueCol).cast("string")
      .cast("binary")), 1, 15), 16, 10).cast("long")
    val kmv = udaf(new graft.functions.KmvAggregator(k))
    df.withColumn("_h", h)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv(col("_h")).as("kmv"))
      .select((groupCols.map(col) :+ col("kmv._1").as("n_kept") :+
        col("kmv._2").as("kth_hash") :+ col("kmv._3").as("est_distinct")): _*)
  }

  /** KMV SET ALGEBRA (Beyer et al. SIGMOD 2007 §4) — union,
    * intersection, and Jaccard estimates between two audiences from
    * their bottom-k sketches alone, with q340's distinguishing
    * property intact: every estimate REPLAYS cross-engine even in the
    * approximate regime. K(A∪B) is the k smallest of the merged kept
    * sets (sketch mergeability), ρ̂ = |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)|
    * estimates Jaccard, |A∪B| comes from K(A∪B)'s order statistic,
    * and |A∩B| = ρ̂·|A∪B| — all deterministic integers plus two final
    * divisions. Unsaturated sketches (< k kept) degrade to exact set
    * algebra (the denominators use the KEPT size, not k).
    *
    * Shape: the base table is materialized once, three filtered O(k)
    * sketch aggregations collect driver-side (the q231 O(sketch)
    * set-algebra contract), and the algebra itself is O(k) Scala.
    *
    * @return one row: (k, n_a_kept, n_b_kept, n_u_kept, est_a, est_b,
    *         est_union, jacc_num, jaccard9, est_inter). */
  def kmvSetAlgebra(df: DataFrame, valueCol: String, inA: Column,
                    inB: Column, k: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val h = conv(substring(md5(col(valueCol).cast("string")
      .cast("binary")), 1, 15), 16, 10).cast("long")
    val base = df.select(h.as("_h"), inA.as("_a"), inB.as("_b"))
      // three sketch aggs read it — scan once; staged (round-12)
      .transform(graft.util.Snapshots.stage)
    val kmvH = udaf(new graft.functions.KmvHashesAggregator(k))
    def sketch(pred: Column): Seq[Long] =
      base.where(pred).agg(kmvH(col("_h"))).first()
        .getSeq[Long](0)
    val ka = sketch(col("_a"))
    val kb = sketch(col("_b"))
    val ku = sketch(col("_a") || col("_b"))
    val (sa, sb) = (ka.toSet, kb.toSet)
    val jaccNum = ku.count(x => sa(x) && sb(x)).toLong
    val nU = ku.length.toLong
    val estU = graft.functions.KmvAggregator.estimate(ku, k)
    val jaccard9 =
      if (nU == 0) 0.0
      else BigDecimal(jaccNum.toDouble / nU.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // product in BigInt (the estimate()'s own discipline): jaccNum·estU
    // overflows a long once est_union passes ~3.6e16 at k=256, while
    // the oracle's HUGEINT expression does not
    val estInter = if (nU == 0) 0L else {
      val e = BigInt(jaccNum) * BigInt(estU) / BigInt(nU)
      if (e > Long.MaxValue) Long.MaxValue else e.toLong
    }
    Seq((k.toLong, ka.length.toLong, kb.length.toLong, nU,
      graft.functions.KmvAggregator.estimate(ka, k),
      graft.functions.KmvAggregator.estimate(kb, k),
      estU, jaccNum, jaccard9, estInter))
      .toDF("k", "n_a_kept", "n_b_kept", "n_u_kept", "est_a", "est_b",
        "est_union", "jacc_num", "jaccard9", "est_inter")
  }

  /** The HLL estimate from [[portableHllRegisters]] registers, kept
    * cross-engine-deterministic: the harmonic sum Σ2^(−Mj) is EXACT
    * integer math (Σ 2^(width+1−Mj) in a long, empty buckets at
    * 2^(width+1)), and the only floating steps are the fixed literal
    * expression α·m²·2^(width+1)/S plus Flajolet's small-range linear
    * count m·ln(m/V) — IEEE-deterministic given identical structure,
    * with ln's 1-ulp libm drift absorbed by round(·, 4). */
  def portableHllEstimate(regs: DataFrame, groupCols: Seq[String],
                          lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 16)
    val m = 1 << lgK
    val width = 60 - lgK
    val emptyTerm = 1L << (width + 1)
    // α_m · m² · 2^(width+1): same literal structure as the oracle SQL
    val num = (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))) *
      lit(m.toDouble * m.toDouble) * lit(emptyTerm.toDouble)
    regs.groupBy(groupCols.map(col): _*)
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${width + 1} - reg)"))
          .as("s_occ"),
        count(lit(1)).as("occ"))
      .withColumn("s_all",
        col("s_occ") + (lit(m.toLong) - col("occ")) * lit(emptyTerm))
      .withColumn("v", lit(m.toLong) - col("occ"))
      .withColumn("e_raw", num / col("s_all").cast("double"))
      .withColumn("approx_distinct",
        round(when(col("e_raw") <= lit(2.5 * m) && col("v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
          .otherwise(col("e_raw")), 4))
      .select((groupCols.map(col) :+ col("approx_distinct")): _*)
  }
}
