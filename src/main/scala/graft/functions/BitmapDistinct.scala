package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** EXACT distinct-count as a mergeable chunked-bitmap aggregate — the
  * Roaring-bitmap pattern (Chambi et al. 2016, "Better bitmap
  * performance with Roaring bitmaps"; the structure behind Druid/
  * ClickHouse/Pinot exact COUNT DISTINCT): ids are bucketed by their
  * high bits into 64 Ki-bit containers, so the buffer is proportional
  * to the id ranges actually PRESENT in a partition, not the domain.
  *
  * Why not `count(distinct x)`? That plans an Expand + an extra
  * de-dup shuffle of the raw keys; the bitmap rides the normal
  * partial-aggregation path — partials are O(chunks) bitmaps, the
  * shuffle carries bitmaps, merge is a wordwise OR, finish is a
  * popcount. At 100 TB with dense-ranked user ids this is the
  * standard exact-cardinality plan (approximate needs → the HLL
  * sketches in [[graft.ops.Sketches]]).
  *
  * Contract: inputs must be non-negative (dense-rank upstream ids
  * first — the same precondition Roaring engines impose). Chunk =
  * id >> 16 → Array[Long](1024) container, bit = id & 0xFFFF.
  * OR-merge is associative/commutative/idempotent, so the result is
  * partitioning-invariant and equals COUNT(DISTINCT) exactly —
  * which is what lets q215 share its oracle.
  */
class BitmapDistinctAggregator
    extends Aggregator[Long, Map[Int, Array[Long]], Long] {

  override def zero: Map[Int, Array[Long]] = Map.empty

  override def reduce(b: Map[Int, Array[Long]], v: Long): Map[Int, Array[Long]] = {
    require(v >= 0L, s"bitmap distinct needs non-negative ids, got $v")
    val chunk = (v >> 16).toInt
    val bit = (v & 0xFFFFL).toInt
    b.get(chunk) match {
      case Some(words) =>
        words(bit >> 6) |= 1L << (bit & 63); b
      case None =>
        val words = new Array[Long](1024)
        words(bit >> 6) |= 1L << (bit & 63)
        b.updated(chunk, words)
    }
  }

  override def merge(a: Map[Int, Array[Long]],
                     b: Map[Int, Array[Long]]): Map[Int, Array[Long]] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foldLeft(big) { case (acc, (chunk, words)) =>
      acc.get(chunk) match {
        case Some(w) =>
          var i = 0
          while (i < 1024) { w(i) |= words(i); i += 1 }
          acc
        case None => acc.updated(chunk, words)
      }
    }
  }

  override def finish(b: Map[Int, Array[Long]]): Long =
    b.valuesIterator.map(w => w.iterator.map(java.lang.Long.bitCount(_).toLong).sum).sum

  override def bufferEncoder = org.apache.spark.sql.Encoders.kryo[Map[Int, Array[Long]]]
  override def outputEncoder = org.apache.spark.sql.Encoders.scalaLong
}
