package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-snapshot TABLE RECONCILIATION fingerprints — the
  * anti-entropy primitive for verifying a 100 TB copy/migration
  * without moving the data again: both sides compute a small
  * per-bucket digest table and compare THOSE (B rows, not N).
  * A mismatched bucket narrows re-verification to ~N/B rows —
  * Merkle-style divergence search done with plain aggregation.
  *
  * Digest design: per row, a 60-bit integer from the md5 of a
  * canonical `|`-joined column rendering (the q98 portable-hash
  * discipline — both engines parse the same 15 hex chars); per
  * bucket, the row COUNT and the XOR of row hashes. XOR is
  * commutative, associative, self-inverse, and overflow-free, so the
  * bucket digest is order-insensitive and MERGEABLE — partial
  * aggregation does almost all the work map-side, and any row
  * difference flips bits with probability 1 − 2⁻⁶⁰.
  *
  * Callers canonicalize value columns BEFORE hashing (cents bigints
  * for money, strings as-is) — never hash raw doubles; their
  * rendering is engine-specific.
  */
object Reconcile {

  /** 60-bit portable row hash of the given (pre-canonicalized)
    * columns. */
  def rowHash60(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", cols: _*).cast("binary")), 1, 15),
      16, 10).cast("long")

  /** Bucketed fingerprint: `nBuckets` rows of (bucket, n_rows,
    * xor60). The bucket comes from the KEY hash only, so a row keeps
    * its bucket when a value column drifts — an edit surfaces as a
    * same-count xor mismatch in exactly one bucket, an insert/delete
    * as a count drift in exactly one bucket (the property that makes
    * binary divergence search work). The xor digests the FULL row.
    * One partial-agg shuffle of B keys, invariant to layout, row
    * order, and partitioning. */
  def tableFingerprint(df: DataFrame, keyCols: Seq[Column],
                       valueCols: Seq[Column], nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "need at least one bucket")
    df.select(rowHash60(keyCols).as("kh"),
        rowHash60(keyCols ++ valueCols).as("h"))
      .groupBy(pmod(col("kh"), lit(nBuckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor60"))
      .orderBy(col("bucket"))
  }

  /** Compare two snapshots' fingerprints: the buckets that differ
    * (either side missing, row-count drift, or content drift) — the
    * rows a reconciler would re-scan. Joins two B-row tables. */
  def diffBuckets(a: DataFrame, b: DataFrame): DataFrame =
    a.alias("a").join(b.alias("b"), Seq("bucket"), "full_outer")
      .filter(col("a.n_rows").isNull || col("b.n_rows").isNull ||
        col("a.n_rows") =!= col("b.n_rows") ||
        col("a.xor60") =!= col("b.xor60"))
      .select(col("bucket"), col("a.n_rows").as("n_rows_a"),
        col("b.n_rows").as("n_rows_b"))

  /** FELLEGI–SUNTER probabilistic record linkage scoring (Fellegi &
    * Sunter JASA 1969 — the model behind Splink/dedupe.io): candidate
    * pairs from a blocking key get a log-likelihood-ratio match
    * weight, summed over per-field agreement comparisons:
    *
    *   w(pair) = Σ_field  agree ? log2(m/u) : log2((1−m)/(1−u))
    *
    * where m = P(agree | match) and u = P(agree | non-match) are
    * model parameters. Weights enter as INTEGER centi-bits
    * (round(100·log2(·)) — the fixed-point discipline production
    * linkers use for exact reproducibility), so the score is an
    * exact integer sum and the match/possible/non-match decision
    * boundaries replay cross-engine.
    *
    * Scale shape: ONE equi-join on the blocking key — the blocking is
    * what keeps FS linear-ish (O(Σ block²) bounded by the largest
    * block, the [[graft.ops.Dedup]] banding argument); comparisons
    * are narrow codegen scalar exprs; no state anywhere.
    *
    * @param pairs   candidate pairs with one boolean `agree_<field>`
    *                column per comparison ([[blockedPairs]] output).
    * @param weights (field, agreeCentibits, disagreeCentibits) —
    *                round(100·log2(m/u)) / round(100·log2((1−m)/(1−u))).
    */
  def fsScore(pairs: DataFrame,
              weights: Seq[(String, Long, Long)]): DataFrame = {
    val score = weights.map { case (f, wAgree, wDisagree) =>
      when(col(s"agree_$f"), lit(wAgree)).otherwise(lit(wDisagree))
    }.reduce(_ + _)
    pairs.withColumn("fs_score_cb", score)
  }

  /** Blocked candidate pairs for [[fsScore]]: self-join `df` on
    * `blockCols` with id_a < id_b (each unordered pair once), one
    * `agree_<name>` flag per comparison expression pair. */
  def blockedPairs(df: DataFrame, idCol: String, blockCols: Seq[String],
                   comparisons: Seq[(String, Column => Column)]): DataFrame = {
    val a = df.select(col(idCol).as("id_a") +:
      blockCols.map(col) ++:
      comparisons.map { case (n, e) => e(col(n)).as(s"cmp_a_$n") }: _*)
    val b = df.select(col(idCol).as("id_b") +:
      blockCols.map(c => col(c).as(s"_b_$c")) ++:
      comparisons.map { case (n, e) => e(col(n)).as(s"cmp_b_$n") }: _*)
    val cond = blockCols.map(c => a(c) === b(s"_b_$c"))
      .reduce(_ && _) && (a("id_a") < b("id_b"))
    a.join(b, cond)
      .select(col("id_a") +: col("id_b") +: blockCols.map(col) ++:
        comparisons.map { case (n, _) =>
          (col(s"cmp_a_$n") === col(s"cmp_b_$n")).as(s"agree_$n") }: _*)
  }

  /** SNAPSHOT TABLE DIFF — key-level change classification between
    * two versions of a table (the data-ops "what changed since the
    * last load" audit, [[tableFingerprint]]'s row-level companion):
    * one full-outer equi join on the key, each row labeled
    * added / removed / changed / same with the exact list of columns
    * that differ (null-safe comparisons). One shuffle; at 100 TB
    * bucket both versions on the key and the join is co-located.
    *
    * @return (keyCol, status, changed_cols) — changed_cols empty
    *         except for status = changed. */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one compare column")
    val o = oldDf.select(col(keyCol).as("_ok") +:
      cols.map(c => col(c).as(s"_o_$c")): _*)
    val n = newDf.select(col(keyCol).as("_nk") +:
      cols.map(c => col(c).as(s"_n_$c")): _*)
    val diffs = cols.map(c =>
      when(col(s"_o_$c") <=> col(s"_n_$c"), lit(null))
        .otherwise(lit(c)))
    o.join(n, col("_ok") === col("_nk"), "full_outer")
      .withColumn("status",
        when(col("_nk").isNull, "removed")
          .when(col("_ok").isNull, "added")
          .when(concat_ws(",", diffs: _*) === "", "same")
          .otherwise("changed"))
      .select(coalesce(col("_ok"), col("_nk")).as(keyCol), col("status"),
        when(col("status") === "changed", concat_ws(",", diffs: _*))
          .otherwise(lit("")).as("changed_cols"))
  }
}
