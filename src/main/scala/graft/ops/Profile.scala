package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column null counts and exact
  * distinct cardinalities in one declared pass — the statistics a
  * warehouse collects to drive join planning, and the first data-QA
  * report any new ingest gets (a column whose distinct count is 1 is
  * dead; one whose null rate jumped is a broken upstream extractor).
  *
  * Shape: ONE `agg` carrying `count(col)` + `count(distinct col)` per
  * column — Catalyst compiles the multi-distinct into a single Expand
  * (×columns row amplification) with partial aggregation on every
  * path, so the table is still read once and the shuffle carries
  * O(distinct values) rows, not data. The wide one-row result then
  * unpivots via `stack` into the (column, stats) long form. For a
  * quick-look profile at 100 TB swap the exact distinct for
  * `approx_count_distinct` (HLL, no Expand) — exact is declared here
  * because it is the oracle-checkable contract.
  */
object Profile {

  /** EXACT join-output-size prediction from per-key histograms — the
    * planner statistic that catches fan-out blowups BEFORE running the
    * join: |A ⋈ B on k| = Σ_v c_A(v)·c_B(v), computed from two
    * partial-agg count shuffles and a distinct-key-sized join (never
    * the join itself). The top contributing keys are the skew report —
    * the keys a salted join (q67) or AQE skew split would target.
    * NULL keys never match and are excluded on both sides.
    *
    * @return topN rows (rk, k, ca, cb, rows_out) + the global
    *         (total_rows, n_join_keys) on every row (one-row scalar
    *         aggregate broadcast). */
  def joinCardinality(a: DataFrame, ka: String, b: DataFrame, kb: String,
                      topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ca = a.filter(col(ka).isNotNull)
      .groupBy(col(ka).cast("long").as("k")).agg(count(lit(1)).as("ca"))
    val cb = b.filter(col(kb).isNotNull)
      .groupBy(col(kb).cast("long").as("k")).agg(count(lit(1)).as("cb"))
    val j = ca.join(cb, "k")
      .withColumn("rows_out", col("ca") * col("cb"))
    val tot = j.agg(sum(col("rows_out")).as("total_rows"),
      count(lit(1)).as("n_join_keys"))
    j.withColumn("rk",
        row_number().over(Window.orderBy(col("rows_out").desc, col("k")))
          .cast("long"))
      .filter(col("rk") <= topN)
      .crossJoin(broadcast(tot))
      .select(col("rk"), col("k"), col("ca"), col("cb"), col("rows_out"),
        col("total_rows"), col("n_join_keys"))
      .orderBy(col("rk"))
  }

  /** @return (column_name, n_rows, n_null, n_distinct) per column. */
  def columnProfile(df: DataFrame): DataFrame = {
    val names = df.schema.fieldNames.toSeq
    val aggs = names.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c"))
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = names.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    row.selectExpr("n_rows",
        s"stack(${names.length}, $stackArgs) AS (column_name, n_non_null, n_distinct)")
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_null"), col("n_distinct"))
      .orderBy(col("column_name"))
  }

  /** V-OPTIMAL HISTOGRAM (Jagadish et al. VLDB'98) — the
    * minimum-variance bucketing query optimizers actually want for
    * selectivity estimation, where equi-width/equi-depth merely
    * approximate: choose `buckets` boundaries minimizing total
    * within-bucket SSE, by dynamic programming over a PRE-BINNED
    * domain (the one full-data pass: an equi-width quantization to
    * `preBins` cells with exact (count, sum, sumsq) integer partials;
    * the DP then runs on ≤ preBins rows — constant work at any data
    * volume).
    *
    * Determinism: interval SSE = ss − s²/c is ONE fixed IEEE chain on
    * exact integers, round-2-scaled to a long (SSE magnitudes reach ~10^18·cents²; 2 decimals keeps the scaled cost in long range with sub-ulp quantization); DP costs are integer
    * sums of those; every argmin tie-breaks on the smaller split
    * point. The min-plus recurrence runs as `buckets` declarative
    * rounds (join candidate splits → per-endpoint window argmin),
    * and the backtrack is `buckets` O(preBins)-row joins.
    *
    * @return one row per final bucket: (bucket, lo_bin, hi_bin,
    *         bin_lo_value, bin_hi_value, n, sse9) ordered by bucket;
    *         bins are equi-width cells of [min, max]. */
  def vOptimalHistogram(df: DataFrame, vCol: String, preBins: Int = 64,
                        buckets: Int = 4): DataFrame = {
    require(buckets >= 1 && preBins >= buckets,
      "need preBins >= buckets >= 1")
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val t = df.select(col(vCol).cast("long").as("v"))
    val mmRow = t.agg(min(col("v")), max(col("v"))).head()
    val lo = mmRow.getLong(0)
    val hi = mmRow.getLong(1)
    val width = math.max(1L, (hi - lo) / preBins + 1)
    val binCol = least(lit(preBins - 1L), expr(s"(v - ${lo}L) div ${width}L"))
    val bins = t.groupBy(binCol.as("bin"))
      .agg(count(lit(1)).as("c"), sum(col("v")).as("s"),
        sum(col("v").cast(d38) * col("v").cast(d38)).as("ss"))
    // rank present bins 1..m; prefix sums over the ≤preBins-row table
    val wAll = Window.orderBy(col("bin"))
    val pre = bins
      .withColumn("i", row_number().over(wAll).cast("long"))
      .withColumn("cc", sum(col("c")).over(wAll))
      .withColumn("cs", sum(col("s")).over(wAll))
      .withColumn("css", sum(col("ss")).over(wAll))
      .select(col("i"), col("bin"), col("c"), col("cc"), col("cs"),
        col("css"))
      .cache()
    val m = pre.count()
    val zero = pre.sparkSession.range(1).select(lit(0L).as("i"),
      lit(0L).as("cc"), lit(0L).as("cs"), lit(0).cast(d38).as("css"))
    val pfx = pre.select(col("i"), col("cc"), col("cs"), col("css"))
      .unionByName(zero)
    val a = pfx.select(col("i").as("j"), col("cc").as("c0"),
      col("cs").as("s0"), col("css").as("ss0"))
    val b = pfx.filter(col("i") > 0).select(col("i"), col("cc").as("c1"),
      col("cs").as("s1"), col("css").as("ss1"))
    // sse9 of the half-open interval (j, i]
    val iv = a.join(b, col("j") < col("i"))
      .select(col("j"), col("i"),
        graft.util.Exact.scaled(round(
          (col("ss1") - col("ss0")).cast("double") -
            (col("s1") - col("s0")).cast("double") *
            (col("s1") - col("s0")).cast("double") /
            (col("c1") - col("c0")).cast("double"), 2), 2).as("sse2"))
      .cache()
    // DP rounds: dp_b(i) = min_j dp_{b-1}(j) + sse9(j, i)
    var dp = iv.filter(col("j") === 0)
      .select(col("i"), col("sse2").as("cost"), lit(0L).as("arg"))
    val args = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    args += dp
    for (bkt <- 2 to buckets) {
      val cand = dp.select(col("i").as("j"), col("cost").as("pc"))
        .join(iv, Seq("j"))
        .filter(col("j") >= bkt - 1)
        .select(col("i"), (col("pc") + col("sse2")).as("cost"),
          col("j").as("arg"))
      val w = Window.partitionBy(col("i"))
        .orderBy(col("cost"), col("arg"))
      dp = cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn").cache()
      args += dp
    }
    // backtrack: bucket k covers (split_{k-1}, split_k]
    var hiI = m
    val bounds = new Array[Long](buckets + 1)
    bounds(buckets) = m
    for (bkt <- buckets to 1 by -1) {
      val j = args(bkt - 1).filter(col("i") === hiI)
        .select(col("arg")).head().getLong(0)
      bounds(bkt - 1) = j
      hiI = j
    }
    val spark = df.sparkSession
    import spark.implicits._
    val segs = (1 to buckets).map(k =>
      (k.toLong, bounds(k - 1), bounds(k))).toDF("bucket", "jlo", "jhi")
    segs.join(iv, col("jlo") === col("j") && col("jhi") === col("i"))
      .join(pfx.select(col("i").as("jhi2"), col("cc").as("chi")),
        col("jhi") === col("jhi2"))
      .join(pfx.select(col("i").as("jlo2"), col("cc").as("clo")),
        col("jlo") === col("jlo2"))
      .join(pre.select(col("i").as("ilo"), col("bin").as("lo_bin")),
        col("jlo") + 1 === col("ilo"))
      .join(pre.select(col("i").as("ihi"), col("bin").as("hi_bin")),
        col("jhi") === col("ihi"))
      .select(col("bucket"), col("lo_bin"), col("hi_bin"),
        (lit(lo) + col("lo_bin") * width).as("bin_lo_value"),
        (lit(lo) + (col("hi_bin") + 1) * width - 1).as("bin_hi_value"),
        (col("chi") - col("clo")).as("n"), col("sse2"))
      .orderBy(col("bucket"))
  }

  /** DATA-QUALITY CONSTRAINT CHECKS (the Deequ/expectation-suite
    * shape): declared row-level rules, key-uniqueness, and
    * referential-integrity constraints evaluated as EXACT violation
    * counts in one aggregate pass per table — the gate a pipeline
    * runs before promoting a batch. Each check is a single mergeable
    * aggregation (row rules share ONE pass per table via multi-agg),
    * so the whole suite costs one scan per table at any scale; the
    * report is a handful of rows.
    *
    * Output contract (all three helpers): (table_name, check_name,
    * n_rows, n_violations, passed). Union them into the suite. */
  def rowRuleChecks(df: DataFrame, table: String,
                    rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("n_rows") +: rules.map { case (nm, pred) =>
      sum(when(!pred, 1L).otherwise(0L)).as(s"v_$nm")
    }
    val stackArgs = rules.map { case (nm, _) => s"'$nm', v_$nm" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${rules.length}, $stackArgs) AS (check_name, n_violations)")
      .select(lit(table).as("table_name"), col("check_name"),
        col("n_rows"), col("n_violations").cast("long").as("n_violations"),
        when(col("n_violations") === 0, 1L).otherwise(0L).as("passed"))
  }

  /** Key-uniqueness check: violations = n_rows − distinct keys. */
  def uniqueCheck(df: DataFrame, table: String, keyCol: String): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(col(keyCol))).as("nv"))
      .select(lit(table).as("table_name"),
        lit(s"unique_$keyCol").as("check_name"), col("n_rows"),
        col("nv").cast("long").as("n_violations"),
        when(col("nv") === 0, 1L).otherwise(0L).as("passed"))

  /** Referential-integrity check: child rows whose `fk` has no match
    * in the parent's `pk` (broadcast the distinct parent keys when
    * dimension-sized). */
  def refIntegrityCheck(child: DataFrame, fk: String, parent: DataFrame,
                        pk: String, table: String): DataFrame =
    child.select(col(fk).as("_fk"))
      .join(broadcast(parent.select(col(pk).as("_pk")).distinct()),
        col("_fk") === col("_pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_pk").isNull, 1L).otherwise(0L)).as("nv"))
      .select(lit(table).as("table_name"),
        lit(s"ref_${fk}").as("check_name"), col("n_rows"),
        col("nv").cast("long").as("n_violations"),
        when(col("nv") === 0, 1L).otherwise(0L).as("passed"))

  /** EXACT SKEWNESS / KURTOSIS per group from integer power sums —
    * the distribution-shape profile ([[columnProfile]]'s missing
    * moments): heavy-tailed value columns (kurtosis ≫ 3) want robust
    * aggregates and salting; skewed ones bias mean-based monitors.
    *
    * Formulation: the four power sums S₁..S₄ are the ONLY data pass —
    * mergeable integer partials, map-side combined. The central-
    * moment numerators M₂ = n·S₂ − S₁², M₃ = n²·S₃ − 3n·S₁·S₂ + 2·S₁³,
    * M₄ = n³·S₄ − 4n²·S₁·S₃ + 6n·S₁²·S₂ − 3·S₁⁴ are exact
    * decimal(38,0) (HUGEINT in the oracle), and the n-powers cancel:
    * skew = M₃/M₂^1.5, kurt = M₄/M₂² — one fixed IEEE chain each
    * (M₂^1.5 written as M₂·√M₂; √ is correctly rounded per IEEE 754,
    * so cross-engine identical). Headroom: |values|ⁿ up to ~10³⁸ —
    * cents-scaled values to ~10⁹ rows per group; beyond that, shard
    * the group and merge the integer partials.
    *
    * @return (groupCol, n, s1, var2, skew9, kurt9) — variance at 2
    *         decimals (its cents² magnitude makes a 9-decimal round ask
    *         for >15 significant digits, beyond double; skew/kurt are
    *         O(1) and keep round-9) — skew/kurt NULL
    *         for zero-variance groups. */
  def momentsProfile(df: DataFrame, groupCol: String, vCol: String)
      : DataFrame = {
    val d38 = "decimal(38,0)"
    val x = col(vCol).cast("long").cast(d38)
    val agg = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(col(vCol).cast("long")).as("s1"),
        sum(x * x).as("s2"), sum(x * x * x).as("s3"),
        sum(x * x * x * x).as("s4"))
    val n = col("n").cast(d38)
    val s1 = col("s1").cast(d38)
    val m2 = n * col("s2") - s1 * s1
    val m3 = n * n * col("s3") - lit(3).cast(d38) * n * s1 * col("s2") +
      lit(2).cast(d38) * s1 * s1 * s1
    val m4 = n * n * n * col("s4") -
      lit(4).cast(d38) * n * n * s1 * col("s3") +
      lit(6).cast(d38) * n * s1 * s1 * col("s2") -
      lit(3).cast(d38) * s1 * s1 * s1 * s1
    agg.select(col("g").as(groupCol), col("n"), col("s1"),
      round(m2.cast("double") /
        (col("n").cast("double") * col("n").cast("double")), 2).as("var2"),
      when(m2 === lit(0).cast(d38), lit(null)).otherwise(
        round(m3.cast("double") /
          (m2.cast("double") * sqrt(m2.cast("double"))), 9)).as("skew9"),
      when(m2 === lit(0).cast(d38), lit(null)).otherwise(
        round(m4.cast("double") /
          (m2.cast("double") * m2.cast("double")), 9)).as("kurt9"))
  }
}
