package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a bounded-buffer AGGREGATE (SURVEY §2.10 custom
  * UDAF tier; SURVEY T2 semantics: value desc, key asc tie-break).
  *
  * The window formulation (`TopK.perGroup`) sorts within groups (with
  * WindowGroupLimit pruning at scale); this aggregator keeps at most
  * k (value, key) pairs per group per map task, combines partials
  * map-side, and — unlike a window — COMPOSES with other aggregates
  * in the same `groupBy` pass, so "top-k + count + sum" is one
  * shuffle instead of a window pass plus a join. Buffers are bounded
  * at k entries, so memory per group is O(k) regardless of group
  * size.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  // value desc, key asc — the engine's deterministic tie-break order
  private def ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)],
                      v: (Double, Long)): Seq[(Double, Long)] =
    if (b.length < k) (b :+ v).sorted(ord)
    else if (ord.lt(v, b.last)) (b.init :+ v).sorted(ord)
    else b

  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
