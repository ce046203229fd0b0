package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass sparse centroid mean (SURVEY §2.10's custom-UDAF tier,
  * §2.4 A7 semantics): buffer = element-wise sums + member count,
  * finish = Σw / n with absent terms counting as 0 — equivalent to
  * `KMeansSparse.meanCentroids`'s explode→groupBy formulation but
  * without the row-explosion shuffle: partial buffers combine
  * map-side, one (small) sparse map per group crosses the wire.
  *
  * Usage: `functions.udaf(new SparseMeanAggregator)` →
  * `df.groupBy("cluster").agg(mean_vec($"vec"))`.
  */
class SparseMeanAggregator
    extends Aggregator[Map[String, Double], (Map[String, Double], Long), Map[String, Double]] {

  override def zero: (Map[String, Double], Long) = (Map.empty, 0L)

  override def reduce(b: (Map[String, Double], Long),
                      v: Map[String, Double]): (Map[String, Double], Long) = {
    val merged = v.foldLeft(b._1) { case (acc, (k, x)) =>
      acc.updated(k, acc.getOrElse(k, 0.0) + x)
    }
    (merged, b._2 + 1)
  }

  override def merge(a: (Map[String, Double], Long),
                     b: (Map[String, Double], Long)): (Map[String, Double], Long) = {
    val (small, large) = if (a._1.size <= b._1.size) (a._1, b._1) else (b._1, a._1)
    val merged = small.foldLeft(large) { case (acc, (k, x)) =>
      acc.updated(k, acc.getOrElse(k, 0.0) + x)
    }
    (merged, a._2 + b._2)
  }

  override def finish(r: (Map[String, Double], Long)): Map[String, Double] =
    if (r._2 == 0) Map.empty
    else r._1.map { case (k, s) => k -> s / r._2 }

  override def bufferEncoder: Encoder[(Map[String, Double], Long)] =
    Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Double]](),
      Encoders.scalaLong)

  override def outputEncoder: Encoder[Map[String, Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Double]]()
}
