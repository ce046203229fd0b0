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
    * @return (groupCol, n, s1, var9, skew9, kurt9) — skew/kurt NULL
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
        (col("n").cast("double") * col("n").cast("double")), 9).as("var9"),
      when(m2 === lit(0).cast(d38), lit(null)).otherwise(
        round(m3.cast("double") /
          (m2.cast("double") * sqrt(m2.cast("double"))), 9)).as("skew9"),
      when(m2 === lit(0).cast(d38), lit(null)).otherwise(
        round(m4.cast("double") /
          (m2.cast("double") * m2.cast("double")), 9)).as("kurt9"))
  }
}
