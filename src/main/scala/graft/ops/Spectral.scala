package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spectral embedding statistics: the dominant right-singular direction
  * of the embedding matrix by POWER ITERATION on the Gram matrix — the
  * distributed core of PCA whitening / anisotropy removal
  * ("all-but-the-top" post-processing), run before indexing or
  * training on an embedding corpus.
  *
  * Each iteration is two row-scaled distributed passes over X (the d×d
  * Gram matrix is never materialized; only the O(d) direction vector
  * crosses the driver, the accepted K-Means-centroid pattern):
  *
  *   dot9_i = Σ_k round(x_ik · v_k · 1e9)     (long; v_k literal)
  *   u9_j   = Σ_i round(x_ij · dot_i · 1e9)   (posexplode + groupBy j)
  *   v9'_j  = round_half_away(u9_j · 1e9 / max_j |u9_j|)
  *
  * The direction lives as a SCALED LONG (v9, |v9| ≤ 1e9) and the
  * ∞-norm normalization is EXACT integer rational rounding (BigInt on
  * the driver, HUGEINT arithmetic in the oracle) — no IEEE operation
  * anywhere in the recurrence except the deterministic per-element
  * round(x·d·1e9) scaling, so `iters` chained iterations replay
  * bit-for-bit cross-engine (the q94 discipline, hardened).
  *
  * Long-sum headroom: u9 accumulates ~1e11-scaled terms, so corpora
  * beyond ~10⁷ rows want a per-partition downscale (or a coarser
  * scale factor) before the final sum — same headroom note as the
  * other scaled-long reductions.
  */
object Spectral {
  import graft.functions.VectorFunctions.dotScaled

  private val S = 1000000000L // 1e9 scale

  /** Round-half-away-from-zero of p/q (q > 0) in exact integer math. */
  private def halfAway(p: BigInt, q: BigInt): Long = {
    val s = if (p.signum < 0) -1 else 1
    (s * ((p.abs * 2 + q) / (q * 2))).toLong
  }

  /** Exact pairwise Pearson CORRELATION MATRIX of the embedding
    * dimensions — the feature-redundancy profile run before
    * whitening/pruning (a pair at |ρ| → 1 is a wasted dimension;
    * the multi-dim sibling of [[topDirection]]'s single axis).
    *
    * Every moment is an exact scaled-long sum of per-row
    * upper-triangle products round(xᵢ·xⱼ·1e9). The Gram pass is a
    * PER-PARTITION OUTER-PRODUCT ACCUMULATOR (mapPartitions over one
    * d(d+1)/2 long array): the first formulation — explode n·d²/2
    * product structs through partial aggregation — shuffled the same
    * O(P·d²) cells but paid an INTERPRETED higher-order-function
    * build per struct (Catalyst does not codegen nested transform/
    * slice lambdas), measured at 5.6 s for 2000×64 vectors at sf0.1;
    * the imperative accumulator is the textbook syrk kernel and the
    * honest 100 TB shape (O(d²) state per partition, one O(P·d²)
    * shuffle). Long sums are order-independent, so the result is
    * bit-identical to the explode plan. Per-element rounding
    * replicates Spark's round() exactly (shortest-decimal HALF_UP):
    * values within 1e-6 of a .5 boundary take the BigDecimal path,
    * everything else the branch-free half-away fast path (the guard
    * is ~10× wider than the ulp at the 1e9 product scale).
    * Cross-moment algebra runs in decimal(38,0) (n·Σxy and
    * ΣxΣy pass 2⁶³), and ρ is one deterministic cast→sqrt→divide
    * chain rounded to 9 decimals — the [[graft.ops.Similarity.centroidDrift]]
    * discipline, so the whole matrix replays in SQL.
    *
    * @return (i, j, n, sxy9, corr9) for 1 ≤ i < j ≤ d (1-based dims,
    *         matching SQL generate_subscripts). */
  /** Spark round(double) semantics, element-wise: HALF_UP on the
    * shortest-decimal image (BigDecimal.valueOf). Fast half-away path
    * off the boundary; the exact BigDecimal path within 1e-6 of .5. */
  private def roundLikeSql(v: Double): Long = {
    val frac = v - math.floor(v)
    if (math.abs(frac - 0.5) < 1e-6)
      java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    else if (v >= 0) math.floor(v + 0.5).toLong
    else math.ceil(v - 0.5).toLong
  }

  def correlationMatrix(df: DataFrame, vecCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val sp = df.sparkSession
    import sp.implicits._
    val cells = df.select(col(vecCol).cast("array<double>")).as[Array[Double]]
      .mapPartitions { it =>
        var d = -1
        var acc: Array[Long] = null // upper triangle incl. diagonal
        var n = 0L
        while (it.hasNext) {
          val x = it.next()
          // null vectors contribute nothing — the same silent skip
          // the explode formulation had (explode of a null array
          // emits no rows, so null rows never reached gram or count)
          if (x != null) {
            if (d < 0) { d = x.length; acc = new Array[Long](d * (d + 1) / 2) }
            require(x.length == d, s"ragged embedding: ${x.length} vs $d")
            n += 1
            var i = 0
            var c = 0
            while (i < d) {
              val xi = x(i)
              var j = i
              while (j < d) {
                // exact Spark-expression association: (xi·xj)·1e9 —
                // pre-scaling xi would round a DIFFERENT double
                acc(c) += roundLikeSql(xi * x(j) * 1000000000d)
                c += 1
                j += 1
              }
              i += 1
            }
          }
        }
        if (n == 0) Iterator.empty
        else {
          // (i, j, partial sxy9, partial n) — 1-based dims
          val buf = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)](acc.length)
          var c = 0
          var i = 0
          while (i < d) {
            var j = i
            while (j < d) {
              buf += ((i + 1L, j + 1L, acc(c), n))
              c += 1
              j += 1
            }
            i += 1
          }
          buf.iterator
        }
      }.toDF("i", "j", "p9", "np")
    val gram = cells.groupBy(col("i"), col("j"))
      .agg(sum(col("p9")).as("sxy9"), sum(col("np")).as("n"))
      .cache()
    val firsts = df
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("i0", "x")))
      .select((col("i0") + 1).as("dim"),
        round(col("x") * 1000000000L).cast("long").as("x9"))
      .groupBy(col("dim")).agg(sum(col("x9")).as("s9"))
    val diag = gram.filter(col("i") === col("j"))
      .select(col("i").as("dim"), col("sxy9").as("sxx9"))
    val m = firsts.join(diag, Seq("dim"))
    // var-like term in 1e18 units: n·Σx²·1e9 − (Σx·1e9)² — decimal exact
    def varTerm(n: Column, sxx: Column, s: Column): Column =
      (n.cast(d38) * sxx.cast(d38) * lit(1000000000L).cast(d38)) -
        (s.cast(d38) * s.cast(d38))
    gram.filter(col("i") < col("j"))
      .join(broadcast(m.withColumnsRenamed(
        Map("dim" -> "i", "s9" -> "si9", "sxx9" -> "sii9"))), Seq("i"))
      .join(broadcast(m.withColumnsRenamed(
        Map("dim" -> "j", "s9" -> "sj9", "sxx9" -> "sjj9"))), Seq("j"))
      .select(col("i"), col("j"), col("n"), col("sxy9"),
        round(((col("n").cast(d38) * col("sxy9").cast(d38) *
            lit(1000000000L).cast(d38)) -
            (col("si9").cast(d38) * col("sj9").cast(d38))).cast("double") /
          (sqrt(varTerm(col("n"), col("sii9"), col("si9")).cast("double")) *
            sqrt(varTerm(col("n"), col("sjj9"), col("sj9")).cast("double"))), 9)
          .as("corr9"))
  }

  /** Returns (dim, v9, comp): the ∞-normalized dominant direction
    * after `iters` power iterations from v₀ = e₁ (no RNG). `dim` is
    * 1-based (matches SQL generate_subscripts); `v9` is the exact
    * scaled-long component, `comp` its double image. */
  def topDirection(df: DataFrame, vecCol: String, iters: Int): DataFrame = {
    val spark = df.sparkSession
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    var v9 = Array.tabulate(dim)(j => if (j == 0) S else 0L)
    // float→double widening is exact and keeps the kernel dispatch on
    // the DOUBLE path (the direction literal is an array<double>)
    val xd = col(vecCol).cast("array<double>")
    for (_ <- 1 to iters) {
      val vLit = array(v9.map(x => lit(x.toDouble / S.toDouble)): _*)
      val dots = df.select(xd.as("x"),
        (dotScaled(xd, vLit).cast("double") / S.toDouble).as("dot"))
      val u = dots
        .select(posexplode(col("x")).as(Seq("j0", "xj")), col("dot"))
        .groupBy(col("j0"))
        .agg(sum(round(col("xj").cast("double") * col("dot") * S.toDouble)
          .cast("long")).as("u9"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val u9 = Array.tabulate(dim)(j => u.getOrElse(j, 0L))
      val norm = u9.map(math.abs).max
      require(norm > 0L, "power iteration collapsed to the zero vector")
      v9 = u9.map(x => halfAway(BigInt(x) * S, BigInt(norm)))
    }
    import spark.implicits._
    v9.zipWithIndex
      .map { case (c, j) => ((j + 1).toLong, c, c.toDouble / S.toDouble) }
      .toSeq.toDF("dim", "v9", "comp")
  }

  /** Per-vector projection onto the `iters`-step dominant direction —
    * PCA leverage along the top component, the signal
    * "all-but-the-top" removal and anisotropy diagnostics rank by.
    * proj9 = Σ_j round(x_j · v_j · 1e9), the SAME per-element scaled
    * rounding as the iteration's dot pass, so the scores chain onto
    * the q128 recurrence bit-for-bit. Returns the `k` most-aligned
    * rows by (|proj9| desc, id asc). Scale shape: the direction is an
    * O(d) literal (broadcast with the plan), the projection is one
    * narrow codegen'd pass, and the cut is TakeOrdered — per-partition
    * heaps, no global sort or single-partition window. */
  def projections(df: DataFrame, idCol: String, vecCol: String,
                  iters: Int, k: Int): DataFrame = {
    val v9 = topDirection(df, vecCol, iters)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    val vLit = array(v9.map(x => lit(x.toDouble / S.toDouble)): _*)
    val xd = col(vecCol).cast("array<double>")
    df.select(col(idCol), dotScaled(xd, vLit).as("proj9"))
      .orderBy(abs(col("proj9")).desc, col(idCol)).limit(k)
      .select(col(idCol), col("proj9"),
        (col("proj9").cast("double") / S.toDouble).as("proj"))
  }

  /** "All-but-the-top" removal (Mu & Viswanath 2018, arXiv:1702.01417
    * §3 step 3): subtract each vector's component along the dominant
    * direction — the anisotropy-removal TRANSFORM the q128 direction
    * and q141 leverage diagnostics feed. The whole computation is
    * exact integer rational arithmetic so the residual ranking
    * replays cross-engine:
    *
    *   x9_j  = round(x_j · 1e9)                      (per-element)
    *   r9_j  = x9_j − half_away(proj9 · v9_j, 1e9)   (DECIMAL(38)/
    *                                                  HUGEINT product)
    *   r6_j  = half_away(r9_j, 1e3)                  (headroom rescale)
    *   rss12 = Σ_j r6_j²                             (long-safe: ≤2⁶⁰)
    *
    * Returns the `k` vectors with the LARGEST residual energy rss12
    * (ties → id) — the rows least explained by the top component, the
    * complement of q141's most-aligned ranking. Scale shape: the
    * direction is an O(d) plan literal, the transform is one narrow
    * pass (zip_with + aggregate fold, no shuffle at all before the
    * TakeOrdered cut). */
  def removeTopResidual(df: DataFrame, idCol: String, vecCol: String,
                        iters: Int, k: Int): DataFrame = {
    val v9 = topDirection(df, vecCol, iters)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    val vLit = array(v9.map(x => lit(x.toDouble / S.toDouble)): _*)
    val v9Lit = array(v9.map(lit(_)): _*)
    val xd = col(vecCol).cast("array<double>")
    // half_away(p, q) for column decimals: sign(p)·⌊(2|p|+q)/2q⌋
    def halfAwayCol(p: org.apache.spark.sql.Column, q: Long) = {
      val mag = floor((abs(p) * 2 + lit(q)) / lit(2L * q)).cast("decimal(38,0)")
      when(p < 0, -mag).otherwise(mag)
    }
    val base = df.select(col(idCol), dotScaled(xd, vLit).as("proj9"),
      transform(xd, e => round(e * lit(S)).cast("long")).as("x9"))
    val r6 = zip_with(col("x9"), v9Lit, (x9j, v9j) => {
      val p = col("proj9").cast("decimal(38,0)") * v9j.cast("decimal(38,0)")
      val r9 = x9j.cast("decimal(38,0)") - halfAwayCol(p, S)
      halfAwayCol(r9, 1000L).cast("long")
    })
    base.select(col(idCol), col("proj9"), r6.as("r6"))
      .select(col(idCol), col("proj9"),
        aggregate(col("r6"), lit(0L), (acc, e) => acc + e * e).as("rss12"))
      .orderBy(col("rss12").desc, col(idCol)).limit(k)
  }

  /** Johnson–Lindenstrauss RANDOM PROJECTION with a seedless ±1
    * matrix (Achlioptas 2003's database-friendly variant): target
    * component j = Σᵢ s(i,j)·vᵢ where the sign is a pure hash of the
    * coordinate pair — the projection matrix is never materialized,
    * shipped, or seeded, so any engine (and any executor, with no
    * broadcast) derives the identical matrix from md5 alone. The
    * dimensionality-reduction sibling of PQ/SQ (quantize per-value)
    * and PCA (data-dependent directions): data-independent, O(d·m)
    * per vector, distance-preserving in expectation.
    *
    * Components stay exact scaled longs: |Σ ±v9| ≤ d·max|v9| — no
    * float accumulation. Signs index the 1-BASED coordinate to match
    * SQL's generate_subscripts convention.
    *
    * @return (id, j ∈ [0, m), proj9) — one row per target dim. */
  def jlProject(df: DataFrame, idCol: String, vecCol: String, m: Int)
      : DataFrame = {
    require(m >= 1)
    val sign = when(substring(
        md5(concat_ws("_", col("i") + 1, col("j")).cast("binary")), 1, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L)
      .otherwise(-1L)
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col(idCol), col("i"),
        round(col("v").cast("double") * 1000000000L).cast("long").as("v9"))
      .withColumn("j", explode(sequence(lit(0L), lit((m - 1).toLong))))
      .groupBy(col(idCol), col("j"))
      .agg(sum(sign * col("v9")).as("proj9"))
      .orderBy(col(idCol), col("j"))
  }
}
