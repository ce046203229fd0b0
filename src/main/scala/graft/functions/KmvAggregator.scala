package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values / bottom-k) DISTINCT-COUNT sketch (Bar-Yossef
  * et al. RANDOM 2002; Beyer et al. SIGMOD 2007) over pre-hashed
  * values — SURVEY §2.10's custom-UDAF tier applied to the sketch
  * family: the buffer is the set of the k SMALLEST distinct hash
  * values seen, which is associative, commutative, and idempotent
  * under union — partials combine map-side and shard sketches
  * max-merge into any coarser rollup exactly (the same mergeability
  * contract as the HLL registers, with a different accuracy/size
  * trade: O(k·8B) state, relative error ~1/√(k−2)).
  *
  * Unlike HLL register estimates, the KMV estimator is FULLY
  * replayable cross-engine even in its approximate regime: with the
  * portable 60-bit md5 hash, the k-th smallest distinct hash is a
  * deterministic order statistic and the estimate
  * (k−1)·2⁶⁰ div h_k is exact integer arithmetic — no libm, no
  * register harmonics. Fewer than k distinct values ⇒ the sketch IS
  * the distinct set and the estimate is exact.
  *
  * Output: (n_kept, kth_hash, est_distinct) — n_kept < k means exact.
  */
object KmvAggregator {
  /** Insert preserving "sorted distinct, at most k" — O(log k) search
    * + O(k) copy, fine for the O(k) buffer sizes this is built for. */
  private[functions] def insert(k: Int)(b: Seq[Long], h: Long): Seq[Long] = {
    if (b.length == k && h >= b.last) return b
    val i = b.search(h)(Ordering.Long) match {
      case scala.collection.Searching.Found(_) => return b // duplicate
      case scala.collection.Searching.InsertionPoint(p) => p
    }
    val grown = (b.take(i) :+ h) ++ b.drop(i)
    if (grown.length > k) grown.dropRight(1) else grown
  }

  /** The KMV distinct estimate from a kept-hash set: exact below k,
    * (k−1)·2⁶⁰ div h_k above — pure integer arithmetic, kept TOTAL:
    * h_k = 0 (a zero 60-bit md5 prefix filling the whole kept set —
    * degenerate but representable) estimates the limit Long.MaxValue
    * instead of throwing, and tiny h_k clamps the BigInt quotient to
    * Long.MaxValue instead of wrapping negative on .toLong. */
  def estimate(hashes: Seq[Long], k: Int): Long = {
    val n = hashes.length.toLong
    if (n < k) n
    else if (hashes.last <= 0L) Long.MaxValue
    else {
      val est = BigInt(k - 1) * (BigInt(1) << 60) / BigInt(hashes.last)
      if (est > Long.MaxValue) Long.MaxValue else est.toLong
    }
  }
}

class KmvAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], (Long, Long, Long)] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] =
    KmvAggregator.insert(k)(b, h)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(KmvAggregator.insert(k))

  override def finish(r: Seq[Long]): (Long, Long, Long) = {
    val n = r.length.toLong
    val kth = if (r.isEmpty) 0L else r.last
    (n, kth, KmvAggregator.estimate(r, k))
  }

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong)
}

/** [[KmvAggregator]]'s sibling that RETURNS the kept-hash set itself —
  * the form sketch set algebra composes over (union = merge, and any
  * subset relation is decidable on the kept sets). */
class KmvHashesAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, s"KMV needs k >= 2, got $k")
  override def zero: Seq[Long] = Vector.empty
  override def reduce(b: Seq[Long], h: Long): Seq[Long] =
    KmvAggregator.insert(k)(b, h)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(KmvAggregator.insert(k))
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
