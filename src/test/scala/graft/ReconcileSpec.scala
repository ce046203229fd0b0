package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Reconcile

class ReconcileSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def fp(rows: Seq[(Long, String)]) =
    Reconcile.tableFingerprint(rows.toDF("id", "v"),
      keyCols = Seq(col("id").cast("string")),
      valueCols = Seq(col("v")), nBuckets = 8)

  test("fingerprint is invariant to row order and partitioning") {
    val rows = (1L to 100L).map(i => (i, s"v$i"))
    val a = fp(rows).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Reconcile.tableFingerprint(
        rows.reverse.toDF("id", "v").repartition(13),
        keyCols = Seq(col("id").cast("string")),
        valueCols = Seq(col("v")), nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSet == b.toSet && a.map(_._2).sum == 100L)
  }

  test("diffBuckets: identical snapshots → empty; one changed row → its bucket only") {
    val rows = (1L to 100L).map(i => (i, s"v$i"))
    val same = Reconcile.diffBuckets(fp(rows), fp(rows)).collect()
    assert(same.isEmpty)
    val changed = rows.updated(41, (42L, "CHANGED"))
    val diff = Reconcile.diffBuckets(fp(rows), fp(changed)).collect()
    // the bucket comes from the KEY hash, so a value edit stays put:
    // exactly one bucket differs, with equal counts (xor caught it)
    assert(diff.length == 1, "a single-row edit flips exactly one bucket")
    assert(diff.head.getLong(1) == diff.head.getLong(2))
  }

  test("diffBuckets: a dropped row shows a count mismatch") {
    val rows = (1L to 50L).map(i => (i, s"v$i"))
    val diff = Reconcile.diffBuckets(fp(rows), fp(rows.tail)).collect()
    assert(diff.length == 1 && diff.head.getLong(1) == diff.head.getLong(2) + 1)
  }
}
