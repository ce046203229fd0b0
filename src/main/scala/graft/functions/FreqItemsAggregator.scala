package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Heavy hitters via the Space-Saving sketch (Metwally et al. 2005) as
  * a mergeable AGGREGATE (SURVEY §2.10 custom UDAF tier) — the
  * "frequent items" rollup every corpus-profiling pipeline needs at
  * 100 TB, where an exact per-key groupBy of a hot domain would be
  * fine but a full-vocabulary rollup of an open-ended key (URLs,
  * n-grams, user agents) would not.
  *
  * Buffer: at most `capacity` (key → (count, err)) entries per partial.
  * On an unseen key with a full buffer, the minimum-count entry is
  * evicted and the newcomer inherits its count as both estimate floor
  * and error bound — the classic guarantees hold: true ≤ est,
  * est − err ≤ true, and every key with true count > n/capacity is
  * retained. Merge follows Agarwal et al., "Mergeable Summaries"
  * (PODS'12): absent keys contribute the other side's minimum count
  * (its maximum possible miss), then the union is re-truncated to
  * `capacity` by (count desc, key asc).
  *
  * EXACT REGIME: while no partial buffer ever fills (capacity ≥
  * distinct keys), nothing evicts, err stays 0, merge degenerates to
  * plain count-sum — the result equals GROUP BY COUNT regardless of
  * partitioning, which is what lets the declared query be
  * oracle-checked cross-engine (the q75/q92/q98 anchor pattern).
  * Approximate-regime bounds are property-checked in SketchesSpec.
  *
  * Scale shape: map-side partials bounded at O(capacity) each, one
  * merge tree — like the HLL sketches, pre-aggregation is mergeable so
  * the shuffle carries sketches, never raw keys.
  */
class FreqItemsAggregator(capacity: Int, k: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long, Long)]] {
  require(capacity >= k && k > 0, "need capacity >= k > 0")

  private def minEntry(b: Map[String, (Long, Long)]): (String, Long) = {
    // deterministic eviction: smallest count, then smallest key
    var bestK: String = null
    var bestC = Long.MaxValue
    b.foreach { case (key, (c, _)) =>
      if (c < bestC || (c == bestC && (bestK == null || key < bestK))) {
        bestK = key; bestC = c
      }
    }
    (bestK, bestC)
  }

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(b: Map[String, (Long, Long)],
                      key: String): Map[String, (Long, Long)] =
    b.get(key) match {
      case Some((c, e))              => b.updated(key, (c + 1, e))
      case None if b.size < capacity => b.updated(key, (1L, 0L))
      case None =>
        val (mk, mc) = minEntry(b)
        (b - mk).updated(key, (mc + 1, mc))
    }

  override def merge(a: Map[String, (Long, Long)],
                     b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val mA = if (a.size < capacity) 0L else a.values.iterator.map(_._1).min
    val mB = if (b.size < capacity) 0L else b.values.iterator.map(_._1).min
    val combined = (a.keySet ++ b.keySet).iterator.map { key =>
      val (ca, ea) = a.getOrElse(key, (mA, mA))
      val (cb, eb) = b.getOrElse(key, (mB, mB))
      key -> (ca + cb, ea + eb)
    }.toMap
    if (combined.size <= capacity) combined
    else combined.toSeq
      .sortBy { case (key, (c, _)) => (-c, key) }
      .take(capacity).toMap
  }

  override def finish(b: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    b.toSeq.map { case (key, (c, e)) => (key, c, e) }
      .sortBy { case (key, c, _) => (-c, key) }
      .take(k)

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    ExpressionEncoder[Map[String, (Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}
