package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Quantize

class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def emb = graft.io.Tables.embeddings(spark, TestSession.sf)

  test("codes are uint8, dimension count preserved, reconstruction within half-step") {
    val cb = Quantize.codebook(emb, "embedding").cache()
    val codes = Quantize.sq8(emb, "vec_id", "embedding", cb)
    val d = emb.select(size(col("embedding"))).first().getInt(0)
    val bad = codes.filter(size(col("codes")) =!= d ||
      array_min(col("codes")) < 0 || array_max(col("codes")) > 255).count()
    assert(bad == 0)
    // reconstruction error ≤ (hi-lo)/510 + float slack per dimension
    val steps = cb.collect().map(r => r.getInt(0) ->
      ((r.getDouble(2) - r.getDouble(1)) / 510.0 + 1e-6)).toMap
    val orig = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val deq = Quantize.dequantize(codes, "vec_id", cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    orig.foreach { case (id, v) =>
      val q = deq(id)
      v.indices.foreach { i =>
        assert(math.abs(v(i) - q(i)) <= steps(i),
          s"vec $id dim $i: ${v(i)} vs ${q(i)} (step ${steps(i)})")
      }
    }
    cb.unpersist()
  }

  test("quantized cosine ranking recalls the exact top-5") {
    val cb = Quantize.codebook(emb, "embedding")
    val deq = Quantize.dequantize(
        Quantize.sq8(emb, "vec_id", "embedding", cb), "vec_id", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val exact = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def top5(qid: Long, space: Map[Long, Array[Double]]): Set[Long] =
      space.toSeq.filter(_._1 != qid)
        .sortBy { case (id, v) => (-cos(space(qid), v), id) }
        .take(5).map(_._1).toSet
    val queries = exact.keys.toSeq.sorted.take(10)
    val recalls = queries.map { q =>
      val e = top5(q, exact); val a = top5(q, deq)
      e.intersect(a).size / 5.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, s"avg SQ8 top-5 recall $avg < 0.8 ($recalls)")
  }

  test("quantized-rerank with candidates = corpus equals exact brute-force top-k") {
    // the q112 anchor argument: the quantized stage only CUTS the
    // candidate list; un-cut, the exact re-rank must reproduce q31
    val emb = graft.io.Tables.embeddings(spark, TestSession.sf)
    val n = emb.count().toInt
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = rows(graft.ops.Similarity.quantizedRerankTopK(
      emb, queries, "vec_id", "embedding", candidates = n, k = 5))
    val exact = rows(graft.ops.Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", k = 5))
    assert(full == exact)
  }

  test("quantized-rerank with a bounded cut keeps high exact-top-5 recall") {
    val emb = graft.io.Tables.embeddings(spark, TestSession.sf)
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    def byQuery(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cut = byQuery(graft.ops.Similarity.quantizedRerankTopK(
      emb, queries, "vec_id", "embedding", candidates = 50, k = 5))
    val exact = byQuery(graft.ops.Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", k = 5))
    val recall = exact.keys.toSeq.map(q =>
      cut(q).intersect(exact(q)).size / 5.0).sum / exact.size
    assert(recall >= 0.8, s"recall@5 with 50-candidate cut = $recall")
  }

  // ---- product quantization --------------------------------------------

  test("pq: identical vectors share codes; ADC of an exact copy is zero") {
    import spark.implicits._
    // 16 well-separated base vectors (dim 16, m=4 → sub=4) + an exact
    // copy of base 7 under a non-codebook id
    val base = (0 until 16).map(j =>
      (j.toLong, Array.tabulate(16)(i => (j * 16 + i).toFloat / 10)))
    val corpus = (base :+ (20L, base(7)._2)).toDF("vec_id", "embedding")
    val codes = Quantize.pqEncode(corpus, "vec_id", "embedding",
        m = 4, nCodes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (s <- 0L until 4L) {
      assert(codes((7L, s)) == 7L, "a codebook vector encodes to itself")
      assert(codes((20L, s)) == codes((7L, s)), "an exact copy shares all codes")
    }
    val top = Quantize.pqAdcTopK(corpus,
        corpus.filter(col("vec_id") === 20L), "vec_id", "embedding",
        m = 4, nCodes = 16, k = 1).collect()
    assert(top.length == 1)
    assert(top(0).getAs[Long]("neighbor_id") == 7L)
    assert(top(0).getAs[Long]("adc9") == 0L,
      "ADC to the copied codebook vector is exactly zero (integer arithmetic)")
  }

  test("pq ADC on the real table: k rows per query, ascending integer distances") {
    val out = Quantize.pqAdcTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", m = 8, nCodes = 16, k = 5).cache()
    assert(out.count() == 25L)
    val perQ = out.groupBy("query_id").count()
      .filter(col("count") =!= 5L).count()
    assert(perQ == 0L)
    val nonMono = out.withColumn("prev",
        lag(col("adc9"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("rk"))))
      .filter(col("prev").isNotNull && col("adc9") < col("prev")).count()
    assert(nonMono == 0L, "adc9 must ascend with rank")
    out.unpersist(blocking = false)
  }

  // ---- IVF-PQ ----------------------------------------------------------

  test("ivf-pq with nProbe == kCoarse degenerates to flat PQ ADC") {
    // probing every list removes the pruning, so the composed search
    // must equal pqAdcTopK row-for-row (same integer cut)
    val qs = emb.filter(col("vec_id") < 5)
    val flat = Quantize.pqAdcTopK(emb, qs, "vec_id", "embedding",
      m = 8, nCodes = 16, k = 5)
    val ivf = Quantize.ivfPqTopK(emb, qs, "vec_id", "embedding",
      kCoarse = 4, nProbe = 4, m = 8, nCodes = 16, k = 5)
    assert(ivf.exceptAll(flat).count() == 0L && flat.exceptAll(ivf).count() == 0L)
  }

  test("ivf-pq prunes to the probed buckets only") {
    val qs = emb.filter(col("vec_id") < 5)
    val out = Quantize.ivfPqTopK(emb, qs, "vec_id", "embedding",
      kCoarse = 4, nProbe = 2, m = 8, nCodes = 16, k = 5).cache()
    // ≤ k rows per query, ascending distances
    assert(out.groupBy("query_id").count().filter(col("count") > 5L).count() == 0L)
    val nonMono = out.withColumn("prev",
        lag(col("adc9"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("rk"))))
      .filter(col("prev").isNotNull && col("adc9") < col("prev")).count()
    assert(nonMono == 0L)
    // every returned neighbor's flat-ADC distance also appears in the
    // unpruned ranking with the same integer value (pruning can only
    // REMOVE candidates, never change a surviving pair's distance)
    val flat = Quantize.pqAdcTopK(emb, qs, "vec_id", "embedding",
        m = 8, nCodes = 16, k = Int.MaxValue)
      .select(col("query_id"), col("neighbor_id"), col("adc9"))
    val mismatched = out.select(col("query_id"), col("neighbor_id"), col("adc9"))
      .exceptAll(flat).count()
    assert(mismatched == 0L, "pruned distances must match the flat ADC values")
    out.unpersist(blocking = false)
  }
}
