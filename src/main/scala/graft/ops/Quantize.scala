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
  /** SQ8 RECONSTRUCTION-ERROR report — the index-tuning measurement
    * behind every "is 4× compression acceptable" decision: per
    * vector, the exact squared reconstruction error of the
    * quantize→dequantize round trip and its ratio to the vector's
    * energy. Errors are per-element round-9 scaled longs (exact,
    * order-free sums); the codebook/codes/dequantize chain is the
    * same deterministic arithmetic the q68/q112 oracles replay.
    *
    * @return (id, sse9, norm9, rel9) — rel9 = sse/‖x‖² round-9,
    *         NULL for a zero vector. */
  def sq8ReconError(df: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    val cb = codebook(df, vecCol)
    val codes = sq8(df, idCol, vecCol, cb)
    val deq = dequantize(codes, idCol, cb)
    df.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .join(deq, Seq(idCol))
      .select(col(idCol),
        // native kernels — identical HALF_UP rounding and fold order
        // as the HOF folds they replace (round-11, guide §4)
        graft.functions.VectorFunctions.sqDistScaled9(col("v"), col("vec_q"))
          .as("sse9"),
        graft.functions.VectorFunctions.normSqScaled9(col("v")).as("norm9"))
      .withColumn("rel9", when(col("norm9") === 0, lit(null))
        .otherwise(round(col("sse9").cast("double") /
          col("norm9").cast("double"), 9)))
  }

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

  // ---- IVF-PQ: coarse inverted-file pruning × PQ ADC scoring --------

  /** Full-vector exact scaled-long squared distance (the per-subspace
    * subDist9 summed over all subspaces — per-element rounding makes
    * the two formulations the same integer). */
  private def fullDist9(x: org.apache.spark.sql.Column,
                        c: org.apache.spark.sql.Column) =
    normSqScaled(x) - lit(2L) * dotScaled(x, c) + normSqScaled(c)

  /** IVF-PQ composed search — the production billion-scale ANN shape
    * (FAISS IndexIVFPQ with `by_residual=false`): a coarse inverted
    * file prunes the corpus to `nProbe` of `kCoarse` lists per query,
    * and only the surviving candidates are scored, by PQ ADC (m LUT
    * integer additions each) instead of a d-dim float loop. Completes
    * the family ladder: brute (q30/q31) → IVF-Flat (q47/q75/q93) →
    * PQ-ADC flat (q133) → IVF-PQ (q143).
    *
    * Coarse centroids are the `kCoarse` lowest-id vectors entering the
    * plan as a posexplode LITERAL (the IvfIndex/SemDeDup deterministic-
    * codebook idiom — production trains them; the plan shape is
    * unchanged), assignment/probing argmin by EXACT scaled-long
    * distance with (d9, bucket) tie-break, so bucket membership, the
    * probe set, and the final ADC cut all replay cross-engine.
    *
    * Scale shape: assignment collapses map-side (groupBy-min(struct) —
    * one narrow pass over the corpus); at 100 TB `bucket` is the
    * table's partition key so a probe touches nProbe partitions
    * (partition pruning does the data skipping); the candidate join is
    * bucket-keyed (each (query, candidate) pair meets in exactly ONE
    * bucket — assignment is unique — so no dedup pass); the ADC stage
    * is a broadcast O(Q·m·nCodes) LUT join + one (query, candidate)
    * partial-agg shuffle over the PRUNED candidate set only.
    * Output: (query_id, rk, neighbor_id, adc9). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, kCoarse: Int = 4, nProbe: Int = 2,
                m: Int = 8, nCodes: Int = 16, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coarse = corpus.filter(col(idCol) < kCoarse)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    require(coarse.nonEmpty, "corpus must contain the coarse-centroid ids")
    val coarseLit = typedlit(coarse)
    val assign = corpus
      .select(col(idCol), col(vecCol), explode(coarseLit).as("c"))
      .withColumn("d9f", fullDist9(col(vecCol), col("c._2")))
      .groupBy(col(idCol))
      .agg(min(struct(col("d9f"), col("c._1").as("bucket"))).as("best"))
      .select(col(idCol).as("neighbor_id"), col("best.bucket").as("bucket"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("d9f"), col("bucket"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol), explode(coarseLit).as("c"))
      .select(col("query_id"), col("c._1").as("bucket"),
        fullDist9(col(vecCol), col("c._2")).as("d9f"))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("bucket"))
    val codes = pqEncode(corpus, idCol, vecCol, m, nCodes)
    val (sub, entries) = pqCodebook(corpus, idCol, vecCol, m, nCodes)
    val csLit = typedlit(entries)
    val lut = queries
      .select(col(idCol).as("query_id"), col(vecCol), explode(csLit).as("c"))
      .select(col("query_id"), col("c._1").cast("long").as("s"),
        col("c._2").as("code"),
        subDist9(slice(col(vecCol), col("c._1") * sub + 1, lit(sub)),
          col("c._3")).as("lut9"))
    val cand = assign.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc9"), col("neighbor_id"))
    cand
      .join(codes.withColumnRenamed(idCol, "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(lut), Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("lut9")).as("adc9"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("adc9"))
  }
}
