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
}
