package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for embedding columns — the memory lever
  * of vector search at scale: each float32 dimension compresses to a
  * uint8 code against per-dimension [min, max] ranges (4× smaller
  * vectors, distance computations on bytes), with the codebook (two
  * doubles per dimension) small enough to broadcast anywhere.
  *
  * Shape: one posexplode + a d-row stats aggregate + a broadcast join
  * back — no driver-side data, codebook is O(d). Quantization error
  * is bounded by range/510 per dimension; QuantizeSpec asserts
  * dequantized-cosine top-k recall against the exact ranking.
  *
  * Determinism: codes are round((x−lo)·255/(hi−lo)) with min/max from
  * exact comparisons (no summation) — bit-identical across engines,
  * which is what lets q68 hash-check the codes cross-engine.
  */
object Quantize {

  /** Per-dimension [lo, hi] codebook (d rows). */
  def codebook(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))

  /** Quantize to uint8 codes: (id, codes array<int> in dimension
    * order). Constant dimensions (hi == lo) code to 0. */
  def sq8(df: DataFrame, idCol: String, vecCol: String,
          cb: DataFrame): DataFrame = {
    val ex = df.select(col(idCol), posexplode(col(vecCol)).as(Seq("i", "x")))
    ex.join(broadcast(cb), Seq("i"))
      // clamp: a codebook trained on a sample/snapshot may not cover
      // every value — codes must stay uint8 regardless
      .withColumn("code",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          greatest(lit(0), least(lit(255),
            round((col("x").cast("double") - col("lo")) * 255.0
              / (col("hi") - col("lo")))))).cast("int"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("code")))),
        e => e.getField("code")).as("codes"))
  }

  /** Dequantize codes back to per-dimension doubles (midpoint-free
    * lower-edge reconstruction: lo + code·(hi−lo)/255). */
  def dequantize(codes: DataFrame, idCol: String, cb: DataFrame): DataFrame =
    codes.select(col(idCol), posexplode(col("codes")).as(Seq("i", "code")))
      .join(broadcast(cb), Seq("i"))
      .withColumn("xq",
        when(col("hi") === col("lo"), col("lo")).otherwise(
          col("lo") + col("code") * (col("hi") - col("lo")) / 255.0))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("xq")))),
        e => e.getField("xq")).as("vec_q"))

  // ---- Product quantization (Jégou et al. 2011, "Product
  // quantization for nearest neighbor search") ------------------------

  import graft.functions.VectorFunctions.{dotScaled, normSqScaled}

  /** The (subspace, code, sub-centroid) literal codebook: sub-slices
    * of the `nCodes` lowest-id vectors — the same deterministic-
    * codebook convention as Similarity.semDedup (production trains
    * per-subspace K-Means; the plan shape is unchanged). O(nCodes·d)
    * driver state. Returns (subDim, entries (s, j, subvec)). */
  private def pqCodebook(df: DataFrame, idCol: String, vecCol: String,
                         m: Int, nCodes: Int): (Int, Seq[(Int, Long, Seq[Float])]) = {
    val cents = df.filter(col(idCol) < nCodes)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    require(cents.nonEmpty, "corpus must contain the codebook ids")
    val dim = cents.head._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val entries = for {
      (j, v) <- cents.toSeq
      s <- 0 until m
    } yield (s, j, v.slice(s * sub, (s + 1) * sub))
    (sub, entries)
  }

  /** Subspace squared distance in EXACT scaled-long arithmetic:
    * d9(x,c) = nsq9(x) − 2·dot9(x,c) + nsq9(c) — every term a
    * round(·×1e9) long sum, so any engine computes the identical
    * integer and the argmin/top-k boundaries replay. */
  private def subDist9(subx: org.apache.spark.sql.Column,
                       subc: org.apache.spark.sql.Column) =
    normSqScaled(subx) - lit(2L) * dotScaled(subx, subc) + normSqScaled(subc)

  /** PQ-encode: each vector becomes `m` one-byte-ish codes — the
    * index of its nearest sub-centroid per subspace (exact scaled-
    * long distance, (d9, j) tie-break). Memory: m codes replace d
    * floats (for d=64, m=8: 32× smaller than float32). The scoring
    * stage explodes the LITERAL codebook per row (joinless — the
    * IvfIndex idiom) and the argmin collapses map-side via
    * groupBy-min(struct), so the shuffle carries m rows per vector.
    * Output: (id, s, code) — one row per (vector, subspace). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               m: Int = 8, nCodes: Int = 16): DataFrame = {
    val (sub, entries) = pqCodebook(df, idCol, vecCol, m, nCodes)
    val csLit = typedlit(entries)
    df.select(col(idCol), col(vecCol), explode(csLit).as("c"))
      .withColumn("d9", subDist9(
        slice(col(vecCol), col("c._1") * sub + 1, lit(sub)), col("c._3")))
      .groupBy(col(idCol), col("c._1").as("s"))
      .agg(min(struct(col("d9"), col("c._2").as("j"))).as("best"))
      .select(col(idCol), col("s").cast("long").as("s"),
        col("best.j").as("code"))
  }

  /** Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: each
    * query precomputes an m×nCodes lookup table of exact subspace
    * distances to every sub-centroid, and a corpus vector's distance
    * is the SUM of table entries selected by its codes — m integer
    * additions per candidate, never a d-dimensional float loop. The
    * LUT is O(Q·m·nCodes) and broadcasts; the scan is one narrow
    * join on (subspace, code) + a (query, candidate) partial-agg
    * shuffle. All-integer arithmetic end-to-end ⇒ the candidate
    * ranking is engine-exact (oracle q133), unlike float ADC where
    * the cut is summation-order-dependent.
    * Output: (query_id, rk, neighbor_id, adc9). */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, m: Int = 8, nCodes: Int = 16,
                k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = pqEncode(corpus, idCol, vecCol, m, nCodes)
    val (sub, entries) = pqCodebook(corpus, idCol, vecCol, m, nCodes)
    val csLit = typedlit(entries)
    val lut = queries
      .select(col(idCol).as("query_id"), col(vecCol), explode(csLit).as("c"))
      .select(col("query_id"), col("c._1").cast("long").as("s"),
        col("c._2").as("code"),
        subDist9(slice(col(vecCol), col("c._1") * sub + 1, lit(sub)),
          col("c._3")).as("lut9"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc9"), col(idCol))
    codes.join(broadcast(lut), Seq("s", "code"))
      .filter(col("query_id") =!= col(idCol))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("lut9")).as("adc9"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col(idCol).as("neighbor_id"),
        col("adc9"))
  }
}
