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
class KmvAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], (Long, Long, Long)] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Seq[Long] = Vector.empty

  /** Insert preserving "sorted distinct, at most k" — O(log k) search
    * + O(k) copy, fine for the O(k) buffer sizes this is built for. */
  private def insert(b: Seq[Long], h: Long): Seq[Long] = {
    if (b.length == k && h >= b.last) return b
    val i = b.search(h)(Ordering.Long) match {
      case scala.collection.Searching.Found(_) => return b // duplicate
      case scala.collection.Searching.InsertionPoint(p) => p
    }
    val grown = (b.take(i) :+ h) ++ b.drop(i)
    if (grown.length > k) grown.dropRight(1) else grown
  }

  override def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[Long]): (Long, Long, Long) = {
    val n = r.length.toLong
    val kth = if (r.isEmpty) 0L else r.last
    val est =
      if (n < k) n // sketch holds every distinct hash — exact
      else (BigInt(k - 1) * (BigInt(1) << 60) / BigInt(kth)).toLong
    (n, kth, est)
  }

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong)
}
