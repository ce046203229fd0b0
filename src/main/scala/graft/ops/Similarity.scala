package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the scale path.
  *
  * Dot products and norms are computed through a scaled-long
  * accumulation (`zip_with` → round(x·y·1e9) → long sum) so results are
  * bit-deterministic and hash-match an external oracle regardless of
  * summation order (see graft.util.Exact for the rationale).
  *
  * Scale shape: brute force is a cross join — O(Q·N·d) — acceptable
  * only when the query side is small (broadcast). The LSH variant
  * buckets both sides by hyperplane sign bits, turning the cross join
  * into a bucket-local join: with p planes, expected candidate fan-in
  * drops by ~2^p at the cost of recall on near-orthogonal neighbors.
  */
object Similarity {
  private val Scale = 1e9
  import graft.functions.VectorFunctions.{dotScaled, normSqScaled}

  /** Spread the streamed side of an all-pairs join across the
    * session's parallelism when the scan under-parallelizes it (small
    * single-row-group files plan as one partition, serializing the
    * O(n²) dot-product loop onto one core). Only worth the extra
    * exchange when each row fans into n comparisons — the quadratic
    * operators below; cheap linear ops don't amortize it. No-op when
    * the input already carries enough partitions (real-scale scans). */
  private def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Bit-deterministic dot product of two array<float>/<double> cols
    * (native codegen'd kernel). */
  def dotExact(a: Column, b: Column): Column =
    dotScaled(a, b).cast("double") / Scale

  /** Bit-deterministic squared L2 norm. */
  def normSqExact(a: Column): Column =
    normSqScaled(a).cast("double") / Scale

  /** Deterministic cosine similarity between two embedding columns.
    * For pairwise joins prefer precomputing `normSqExact` per side —
    * this convenience form recomputes norms per pair. */
  def cosineExact(a: Column, b: Column): Column =
    dotExact(a, b) / (sqrt(normSqExact(a)) * sqrt(normSqExact(b)))

  /** Exact top-k neighbors for each query row (brute force).
    * The query side is broadcast — keep it small; norms are computed
    * once per row on each side, so the O(Q·N) join evaluates only the
    * dot kernel per pair. Output: (query_id, rk, neighbor_id, cos). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      sqrt(normSqExact(col(vecCol))).as("qnorm"))
    val c = fanOut(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      sqrt(normSqExact(col(vecCol))).as("cnorm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dotExact(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))
  }

  /** Production ANN shape: SQ8-quantized candidate scan + exact
    * re-rank — what a real vector-search deployment runs when the
    * corpus no longer fits in float32 (FAISS's SQ index + refine).
    *
    * Stage 1 scans 4×-compressed int codes with a symmetric integer
    * squared distance ([[graft.functions.CodeSqDist]] — all-long
    * arithmetic, so ANY engine computes the identical candidate set;
    * no float drift in the cut) and keeps `candidates` per query with
    * a deterministic (dist, id) tie-break. Stage 2 re-ranks only those
    * candidates with the exact scaled-long cosine. Memory: stage 1
    * touches d bytes/vector instead of 4d; the float vectors are read
    * only for Q×candidates rows. The query side broadcasts (O(k)
    * rows) — stage 1 is LINEAR in the corpus, not quadratic.
    *
    * Both stages are deterministic integer/scaled-long math, so the
    * whole two-stage recurrence is oracle-checkable (q112), unlike
    * float-scored ANN cuts where the candidate boundary is
    * engine-dependent. */
  def quantizedRerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                          vecCol: String, candidates: Int, k: Int): DataFrame = {
    val cb = Quantize.codebook(corpus, vecCol)
    val cCodes = Quantize.sq8(fanOut(corpus), idCol, vecCol, cb)
      .select(col(idCol).as("cand_id"), col("codes").as("ccodes"))
    val qCodes = Quantize.sq8(queries, idCol, vecCol, cb)
      .select(col(idCol).as("query_id"), col("codes").as("qcodes"))
    val scan = cCodes.join(broadcast(qCodes), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        graft.functions.VectorFunctions.codeSqDist(col("qcodes"), col("ccodes"))
          .as("qdist"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qdist"), col("cand_id"))
    val cand = scan.withColumn("crk", row_number().over(wq))
      .filter(col("crk") <= candidates)
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      sqrt(normSqExact(col(vecCol))).as("qnorm"))
    val cv = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"),
      sqrt(normSqExact(col(vecCol))).as("cnorm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    cand.join(broadcast(qv), "query_id").join(cv, "cand_id")
      .withColumn("cos",
        dotExact(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id").as("neighbor_id"),
        col("cos"))
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact,
    * quadratic — oracle/reference path; use LSH at scale). Norms are
    * precomputed per row; the pair loop is one dot kernel. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val withNorm = fanOut(df).select(col(idCol), col(vecCol),
      sqrt(normSqExact(col(vecCol))).as("nrm"))
    val a = withNorm.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("nrm").as("na"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", dotExact(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Deterministic random hyperplanes: `planes` × `dim`, seeded. */
  def hyperplanes(planes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit LSH bucket id of an embedding under the given planes.
    * Zero planes ⇒ the constant bucket 0: every row is a candidate of
    * every other, so the LSH pipeline degenerates to the exact
    * all-pairs result — the oracle anchor configuration (q92). */
  def bucketExpr(vecCol: Column, planes: Array[Array[Double]]): Column = {
    // bucket = Σ_p (dot(vec, plane_p) > 0) << p  — built from per-plane
    // dot products; planes are literals, so this is pure codegen'd math.
    if (planes.isEmpty) lit(0L)
    else planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(vecCol, lit(p), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate near-dup pairs: candidates only within a
    * bucket, then exact cosine verify. Trades recall for a ~2^planes
    * reduction in pair candidates. */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, planes: Int = 8,
                      seed: Long = 42L): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val hp = hyperplanes(planes, dim, seed)
    val bucketed = df.select(col(idCol), col(vecCol),
      sqrt(normSqExact(col(vecCol))).as("nrm"),
      bucketExpr(col(vecCol), hp).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("nrm").as("na"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", dotExact(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .distinct()
  }

  /** [[lshNearDupPairs]] at a FIXED, engine-neutral plane set
    * (round-8 verdict ask #6): hyperplane p's component for dim i is
    * the Rademacher sign ±1 drawn from the md5 parity of "p_i" — the
    * portable randomness idiom the q98 SimHash anchor uses — and the
    * projection is the all-integer Σ sign·round(v_i·1e9), so bucket
    * assignment, the bucket-local candidate join, AND the exact-cosine
    * verify all replay bit-for-bit in an external engine. This makes
    * the LSH PAIR machinery oracle-checkable on a genuinely pruned
    * configuration (q92's planes = 0 anchor only certifies the
    * degenerate single-bucket case); [[lshNearDupPairs]] remains the
    * production variant with seeded Gaussian-free planes.
    *
    * Same scale shape as the parent: one narrow projection scan, one
    * equi join on `bucket`, exact verify — never an all-pairs join. */
  def lshNearDupPairsPortable(df: DataFrame, idCol: String, vecCol: String,
                              threshold: Double, planes: Int): DataFrame = {
    require(planes >= 1 && planes <= 30, "portable LSH wants 1..30 planes")
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(p: Int, i: Int): Long = {
      val hex = md.digest(s"${p}_${i}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
    // dims are keyed 1-based to line up with SQL generate_subscripts
    val signs = Array.tabulate(planes, dim)((p, i) => sign(p, i + 1))
    // one native codegen call per row (round-11, guide §4): the
    // transform + planes×(zip_with+aggregate) HOF chain ran
    // interpreted per (row × plane × dim); identical r9 rounding,
    // long fold order, and >0 bucket-bit rule
    val bucketed = fanOut(df).select(col(idCol), col(vecCol),
        sqrt(normSqExact(col(vecCol))).as("nrm"),
        graft.functions.VectorFunctions.portableLshBucket(
          col(vecCol), signs).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("nrm").as("na"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", dotExact(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** HARD-NEGATIVE mining for embedding-model training: for each query
    * vector, the top-k most-similar corpus vectors with a DIFFERENT
    * label, excluding near-identical vectors (cos ≥ `maxCos` — those
    * are mislabeled duplicates, not negatives). The standard
    * contrastive-training data op (high-cosine wrong-label examples
    * are the gradient-rich ones).
    *
    * Same plan shape as [[bruteForceTopK]]: queries broadcast (O(k)
    * rows), corpus scanned LINEARLY once, exact scaled-long cosine, so
    * the selection boundary is engine-exact and oracle-checkable. For
    * batch-scale query sets use the q93-style distributed-probe IVF
    * plan with a label filter on the probed lists. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int,
                    maxCos: Double = 0.999): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      col(labelCol).as("query_label"), sqrt(normSqExact(col(vecCol))).as("qnorm"))
    val c = fanOut(corpus).select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cvec"), col(labelCol).as("neighbor_label"),
      sqrt(normSqExact(col(vecCol))).as("cnorm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_label") =!= col("neighbor_label"))
      .withColumn("cos",
        dotExact(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .filter(col("cos") < maxCos)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        col("neighbor_label"), col("cos"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication of an embedding corpus. Every vector is assigned
    * to its nearest centroid by cosine (deterministic (cos desc, id)
    * tie-break); WITHIN each cluster, a vector is dropped iff some
    * LOWER-id cluster-mate sits at cosine ≥ `tau` (keep-lowest-id —
    * the deterministic stand-in for the paper's keep-farthest-from-
    * centroid choice). The clustering is the published scale lever:
    * near-dup pairs are enumerated per cluster — O(Σ n_c²), bounded
    * by the largest cluster — never corpus-wide, which is what makes
    * semantic dedup feasible where [[nearDupPairs]]' all-pairs join
    * is not.
    *
    * Centroids here are a deterministic fixed codebook (the
    * `nClusters` lowest-id vectors) so the entire decision chain —
    * assignment, pairing, drop — is exact scaled-long arithmetic an
    * external engine replays value-for-value; production swaps in
    * KMeans‖-trained centroids (graft.cluster.KMeansParallel) without
    * touching the plan shape. Centroids enter the scoring stage as a
    * LITERAL array generated per row (posexplode — the IvfIndex
    * idiom: a 1×k cross join would plan as BroadcastNestedLoopJoin;
    * the generate is joinless), and the argmax collapses map-side
    * (groupBy-max on (cos, -cent) — the shuffle carries one row per
    * vector, never one per (vector, centroid)). The centroid model is
    * O(nClusters) driver state, like every cluster codebook in this
    * repo; its norms are computed by the same scaled-long kernel
    * before collection so the literal carries kernel-exact values.
    * The pair stage is one shuffle join on the cluster id. Output:
    * one row per input vector — (id, cluster, keep). */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               nClusters: Int, tau: Double): DataFrame = {
    val centRows = df.filter(col(idCol) < nClusters)
      .select(col(idCol).cast("long"), col(vecCol),
        sqrt(normSqExact(col(vecCol))))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getSeq[Float](1)))
      .sortBy(_._1)
    require(centRows.nonEmpty,
      s"semDedup: no vectors with $idCol < $nClusters to serve as centroids")
    val csLit = typedlit(centRows.toSeq)
    val v = fanOut(df).select(col(idCol), col(vecCol).as("vec"),
      sqrt(normSqExact(col(vecCol))).as("vnorm"))
    val assigned = v
      .select(col(idCol), col("vec"), col("vnorm"), explode(csLit).as("c"))
      .withColumn("ccos",
        dotExact(col("vec"), col("c._3")) / (col("vnorm") * col("c._2")))
      .groupBy(col(idCol))
      .agg(max(struct(col("ccos"), (-col("c._1")).as("negc"))).as("best"))
      .select(col(idCol), (-col("best.negc")).cast("long").as("cluster"))
      .join(v, idCol)
    val a = assigned.select(col("cluster"), col(idCol).as("id_a"),
      col("vec").as("va"), col("vnorm").as("na"))
    val b = assigned.select(col("cluster"), col(idCol).as("id_b"),
      col("vec").as("vb"), col("vnorm").as("nb"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dotExact(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= tau)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("hit", lit(1))
    assigned.select(col(idCol), col("cluster"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        col("hit").isNull.cast("int").as("keep"))
  }

  /** Embedding NORM-OUTLIER detection — the vector-QA pass an
    * embedding pipeline runs before indexing/training: rows whose
    * squared norm sits farthest from the corpus mean are truncated,
    * zeroed, or wrongly-scaled vectors (a broken encoder shard shows
    * up here first). The ranking key is |n·nsq9 − Σnsq9| — the
    * mean-deviation comparison cross-multiplied into EXACT integers
    * (no division at all), so the outlier cut replays cross-engine.
    * Σnsq9 and n enter as O(1) driver literals (the TfIdf pattern);
    * the scan is one narrow codegen pass + a TakeOrdered cut.
    * Headroom: n·nsq9 stays in long for n ≲ 10⁸ unit-norm d=64 rows;
    * beyond that, downscale nsq9 per partition first (the standing
    * scaled-long headroom note). Output: (id, nsq9, dev). */
  def normOutliers(df: DataFrame, idCol: String, vecCol: String,
                   k: Int): DataFrame = {
    import graft.functions.VectorFunctions.normSqScaled
    val nsq = df.select(col(idCol), normSqScaled(col(vecCol)).as("nsq9"))
    val r = nsq.agg(sum(col("nsq9")).as("s"), count(lit(1)).as("n")).head()
    val (s0, n) = (r.getLong(0), r.getLong(1))
    nsq.select(col(idCol), col("nsq9"),
        abs(col("nsq9") * lit(n) - lit(s0)).as("dev"))
      .orderBy(col("dev").desc, col(idCol)).limit(k)
  }

  /** Per-label embedding CENTROID DRIFT between two halves of the
    * data (even vs odd ids — in production: yesterday vs today, or
    * model A vs model B): the cosine between each label's two
    * half-centroids. The distribution-shift monitor an embedding
    * pipeline runs per ingest batch — a label whose centroid rotates
    * is a class whose meaning moved.
    *
    * Exactness: components enter as round-9 scaled longs and only the
    * per-(label, half, dim) SUM vectors are compared — cosine is
    * scale-invariant, so cos(Σa, Σb) IS cos(centroid_a, centroid_b)
    * and no division by counts ever happens. Dot/norms accumulate as
    * DECIMAL(38,0) (they pass 2^53), and one deterministic
    * cast→sqrt→divide chain produces the presentation cosine.
    *
    * Scale: one narrow posexplode (×dim), one (label, half, dim)
    * partial-agg shuffle collapsing N·dim rows to 2·labels·dim, then
    * toy-sized joins. */
  /** MARGIN-BASED MUTUAL NEAREST NEIGHBORS between two embedding sets
    * — the bitext-mining alignment criterion (Artetxe & Schwenk 2019):
    * a pair qualifies only if each side is the other's top-1 across
    * the boundary, scored by the RATIO MARGIN cos(a,b)·k / Σ top-k
    * cos — raw cosine overrates "hub" vectors that are close to
    * everything; dividing by the neighborhood mean normalizes that
    * away. The aligned-pair miner for parallel-corpus construction,
    * cross-modal (text↔image) linking, and translation-pair QA.
    *
    * Exactness: cosines are the scaled-long rational; the margin
    * denominator is a FIXED left-assoc sum of the k ranked values
    * (pivoted by rank — never an order-free float aggregation), so
    * every margin replays bit-for-bit.
    *
    * Scale: each direction is [[bruteForceTopK]] (broadcast probe
    * side); for two web-scale sides, bucket both through the IVF
    * index first and run this per probed bucket. Mutual filter is
    * one equi join on the two top-1 maps.
    *
    * @return (id_a, id_b, cos, margin_ab9, margin_ba9) — one row per
    *         mutual pair, `a` drawn from the first set. */
  def marginMutualNN(a: DataFrame, b: DataFrame, idCol: String,
                     vecCol: String, k: Int = 4): DataFrame = {
    require(k >= 2, "margin needs at least 2 neighbors")
    val ab = marginSide(bruteForceTopK(b, a, idCol, vecCol, k), k)
      .select(col("query_id").as("id_a"),
        col("nn").as("id_b"), col("cos"), col("margin9").as("margin_ab9"))
    val ba = marginSide(bruteForceTopK(a, b, idCol, vecCol, k), k)
      .select(col("query_id").as("_b"),
        col("nn").as("_a"), col("margin9").as("margin_ba9"))
    ab.join(ba, col("id_a") === col("_a") && col("id_b") === col("_b"))
      .select(col("id_a"), col("id_b"), col("cos"), col("margin_ab9"),
        col("margin_ba9"))
  }

  /** Rank-pivoted ratio margin over a (query_id, rk, neighbor_id,
    * cos) top-k table: margin9 = round(c1·cnt / Σ_fixed c_r, 9) with
    * the FIXED left-assoc denominator (never an order-free float
    * SUM). `cnt` counts the ranks actually present so queries whose
    * probed neighborhood holds fewer than k candidates (possible on
    * the pruned IVF path) still get a well-defined — and identically
    * replayable — margin; with a full neighborhood cnt = k and this
    * is exactly [[marginMutualNN]]'s formula. */
  private def marginSide(topk: DataFrame, k: Int): DataFrame = {
    val cs = (1 to k).map(r =>
      max(when(col("rk") === r, col("cos"))).as(s"c$r"))
    val aggs = max(when(col("rk") === 1, col("neighbor_id"))).as("nn") +: cs
    val denom = (2 to k).foldLeft(col("c1"): Column)((acc, r) =>
      acc + coalesce(col(s"c$r"), lit(0.0)))
    val cnt = (2 to k).foldLeft(lit(1).cast("int"))((acc, r) =>
      acc + col(s"c$r").isNotNull.cast("int"))
    topk.groupBy(col("query_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("query_id"), col("nn"), col("c1").as("cos"),
        round(col("c1") * cnt / denom, 9).as("margin9"))
  }

  /** [[marginMutualNN]] routed through IVF inverted lists — the
    * web-scale arm (round-8 verdict ask #1): instead of each side
    * brute-force scanning the other (O(A·B) dot products), both
    * sides are bucketed by a shared coarse codebook and each query
    * scores ONLY candidates assigned to its `nProbe` nearest lists —
    * O(A·B·nProbe/lists) on balanced lists, with `bucket` the
    * partition key at 100 TB so a probe touches nProbe partitions
    * (the [[IvfIndex]] contract).
    *
    * The codebook is the `lists` lowest-id vectors of the union (the
    * [[semDedup]] fixed-codebook pattern), so the ENTIRE pruned
    * decision chain — centroid distance (per-element round-9 scaled
    * longs, ties to the lower bucket), list assignment, probe set,
    * per-probe cosine top-k, rank-pivoted margin, mutual filter — is
    * exact arithmetic an external engine replays value-for-value:
    * unlike the full-probe-only anchors (q75/q93), the PRUNED path
    * itself is oracle-checkable. Production swaps in KMeans‖-trained
    * centroids without touching the plan shape.
    *
    * Plan shape: codebook enters as a literal via explode (joinless
    * generate — no BroadcastNestedLoopJoin), assignment/probing is
    * one narrow scan + per-id window, candidates come from ONE equi
    * join per direction on `bucket`, and no driver state beyond the
    * O(lists·d) codebook.
    *
    * @return (id_a, id_b, cos, margin_ab9, margin_ba9) — one row per
    *         mutual top-1 pair, `a` drawn from the first set. */
  def marginMutualNNBucketed(a: DataFrame, b: DataFrame, idCol: String,
                             vecCol: String, k: Int, lists: Int,
                             nProbe: Int): DataFrame = {
    require(k >= 2, "margin needs at least 2 neighbors")
    require(lists >= 1 && nProbe >= 1 && nProbe <= lists)
    val cents = a.unionByName(b).orderBy(col(idCol)).limit(lists)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
      .zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
    val csLit = typedlit(cents)
    // per-vector ranked centroid distances: pr = 1 is the list
    // assignment, pr <= nProbe the probe plan — one table serves both
    def ranked(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("id")).orderBy(col("d29"), col("bucket"))
      // d29 via the native kernel — identical HALF_UP rounding and
      // fold order as the zip_with+aggregate HOF it replaces (guide §4)
      fanOut(df).select(col(idCol).as("id"), col(vecCol).as("vec"),
          sqrt(normSqExact(col(vecCol))).as("nrm"))
        .select(col("id"), col("vec"), col("nrm"), explode(csLit).as("c"))
        .withColumn("d29", graft.functions.VectorFunctions.sqDistScaled9(
          col("vec"), col("c._2")))
        .select(col("id"), col("vec"), col("nrm"),
          col("c._1").as("bucket"), col("d29"))
        .withColumn("pr", row_number().over(w))
    }
    val ra = ranked(a).cache()
    val rb = ranked(b).cache()
    def topk(qs: DataFrame, corpus: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      // each corpus vector lives in exactly one list (pr = 1), so a
      // query never meets the same candidate through two probes — no
      // dedup needed after the bucket join
      corpus.filter(col("pr") === 1)
        .select(col("bucket"), col("id").as("neighbor_id"),
          col("vec").as("cvec"), col("nrm").as("cnorm"))
        .join(qs.filter(col("pr") <= nProbe)
          .select(col("bucket"), col("id").as("query_id"),
            col("vec").as("qvec"), col("nrm").as("qnorm")), Seq("bucket"))
        .withColumn("cos",
          dotExact(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
    }
    val ab = marginSide(topk(ra, rb), k)
      .select(col("query_id").as("id_a"),
        col("nn").as("id_b"), col("cos"), col("margin9").as("margin_ab9"))
    val ba = marginSide(topk(rb, ra), k)
      .select(col("query_id").as("_b"),
        col("nn").as("_a"), col("margin9").as("margin_ba9"))
    ab.join(ba, col("id_a") === col("_a") && col("id_b") === col("_b"))
      .select(col("id_a"), col("id_b"), col("cos"), col("margin_ab9"),
        col("margin_ba9"))
  }

  def centroidDrift(df: DataFrame, idCol: String, vecCol: String,
                    labelCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val sums = df
      .select(col(labelCol).as("label"), pmod(col(idCol), lit(2)).as("half"),
        posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy(col("label"), col("half"), col("i"))
      .agg(sum(round(col("v").cast("double") * 1000000000L).cast("long"))
        .as("s9"), count(lit(1)).as("n"))
    val a = sums.filter(col("half") === 0)
      .select(col("label"), col("i"), col("s9").as("sa"), col("n").as("n_even"))
    val b = sums.filter(col("half") === 1)
      .select(col("label"), col("i"), col("s9").as("sb"), col("n").as("n_odd"))
    a.join(b, Seq("label", "i"))
      .groupBy(col("label"))
      .agg(max(col("n_even")).as("n_even"), max(col("n_odd")).as("n_odd"),
        sum((col("sa").cast(d38) * col("sb").cast(d38)).cast(d38)).as("dot"),
        sum((col("sa").cast(d38) * col("sa").cast(d38)).cast(d38)).as("naa"),
        sum((col("sb").cast(d38) * col("sb").cast(d38)).cast(d38)).as("nbb"))
      .select(col("label"), col("n_even"), col("n_odd"),
        col("dot").cast("string").as("dot"),
        col("naa").cast("string").as("naa"),
        col("nbb").cast("string").as("nbb"),
        round(col("dot").cast("double") /
          (sqrt(col("naa").cast("double")) * sqrt(col("nbb").cast("double"))), 9)
          .as("cos9"))
      .orderBy(col("label"))
  }

  /** MMR — MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell &
    * Goldstein SIGIR'98), the diversity-aware rerank every RAG stack
    * bolts onto its retriever: greedily pick the candidate maximizing
    * relevance MINUS its max similarity to what's already picked, so
    * the result list covers the query's facets instead of repeating
    * the top hit five ways.
    *
    * This is the λ = ½ variant on scaled-long dot products (the
    * [[graft.functions.DotScaled]] kernel the ANN family pins
    * cross-engine): score(d) = rel9(d) − maxsim9(d, selected) — both
    * sides scale by λ, so the ½ cancels and every comparison is an
    * exact integer (argmax tie → min id ⇒ fully deterministic,
    * oracle-replayable as an unrolled greedy).
    *
    * Scale: relevance is ONE narrow codegen scan + a TakeOrdered
    * `pool` cut (the production rerank-window pattern — MMR is always
    * run over a bounded candidate window, not the corpus); the
    * pool×pool sim matrix is computed distributively and only
    * O(pool²) scored pairs reach the driver for the O(k·pool) greedy
    * — bounded by the window, independent of corpus size.
    *
    * @return (sel_rank, vec_id, rel9, maxsim9, mmr9) — maxsim9 = 0
    *         for the first pick by convention (empty selected set). */
  def mmrRerank(df: DataFrame, idCol: String, vecCol: String,
                queryId: Long, pool: Int, k: Int): DataFrame = {
    require(k >= 1 && pool >= k)
    import graft.functions.VectorFunctions.dotScaled
    val spark = df.sparkSession
    import spark.implicits._
    val qRow = df.filter(col(idCol) === queryId).select(col(vecCol))
      .collect().head
    val qLit = typedlit(qRow.getSeq[Float](0))
    val poolDf = df.filter(col(idCol) =!= queryId)
      .select(col(idCol).cast("long").as("id"),
        dotScaled(col(vecCol), qLit).as("rel9"), col(vecCol).as("vec"))
      .orderBy(col("rel9").desc, col("id")).limit(pool)
      .cache()
    val sims = poolDf.select(col("id").as("ida"), col("vec").as("va"))
      .join(poolDf.select(col("id").as("idb"), col("vec").as("vb")))
      .filter(col("ida") =!= col("idb"))
      .select(col("ida"), col("idb"), dotScaled(col("va"), col("vb")).as("sim9"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cand = poolDf.select(col("id"), col("rel9"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    poolDf.unpersist(blocking = false)
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
    val chosen = scala.collection.mutable.LinkedHashSet[Long]()
    for (r <- 1 to math.min(k, cand.size)) {
      val best = cand.keysIterator.filterNot(chosen)
        .map { d =>
          val ms = if (chosen.isEmpty) 0L
            else chosen.iterator.map(s => sims((d, s))).max
          (cand(d) - ms, d, ms)
        }
        // argmax score, tie → min id
        .reduce((a, b) => if (a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)) a else b)
      selected += ((r.toLong, best._2, cand(best._2), best._3, best._1))
      chosen += best._2
    }
    selected.toSeq.toDF("sel_rank", "vec_id", "rel9", "maxsim9", "mmr9")
  }

  /** k-CENTER GREEDY (Gonzalez 1985 farthest-point traversal) — the
    * coreset/diverse-subset selector active-learning and data-pruning
    * pipelines use (Sener & Savarese ICLR'18's core-set approach):
    * pick the min-id point, then k−1 times the point FARTHEST from
    * everything selected so far. The greedy is a 2-approximation of
    * the optimal k-center cover — the principled "spread"
    * counterweight to similarity-driven pruning like [[semDedup]].
    *
    * Distances run on SQ8 integer codes ([[Quantize.sq8]] — the q68
    * cross-engine-pinned quantization) through the codegen
    * [[graft.functions.CodeSqDist]] kernel: all-long, exact, so the
    * argmax (tie → min id) is deterministic and the whole trace is
    * oracle-replayable.
    *
    * Scale: each round is ONE narrow scan computing
    * mind := least(mind, d²(·, new center)) — the classic O(n·k)
    * farthest-point sweep, never a pairwise matrix — plus an
    * O(1)-row TakeOrdered argmax; the new center's d-int code vector
    * is the only driver state (codebook-sized, the [[Quantize]]
    * invariant).
    *
    * @return (sel_rank, vec_id, d2) — d2 = the selected point's min
    *         squared code-distance to the previously-selected set
    *         (0 for the seed); the k-center radius trace. */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1)
    import graft.functions.VectorFunctions.codeSqDist
    val spark = df.sparkSession
    import spark.implicits._
    val cb = Quantize.codebook(df, vecCol)
    val codes = Quantize.sq8(df, idCol, vecCol, cb)
      .select(col(idCol).cast("long").as("id"), col("codes")).cache()
    val seedRow = codes.orderBy(col("id")).limit(1).collect().head
    def codeLit(r: org.apache.spark.sql.Row): Column =
      typedlit(r.getSeq[Int](1))
    val sel = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    sel += ((1L, seedRow.getLong(0), 0L))
    var state = codes
      .withColumn("mind", codeSqDist(col("codes"), codeLit(seedRow)))
      .cache()
    for (r <- 2 to k) {
      val far = state.filter(!col("id").isInCollection(sel.map(_._2)))
        .orderBy(col("mind").desc, col("id")).limit(1)
        .select(col("id"), col("codes"), col("mind"))
        .collect().head
      sel += ((r.toLong, far.getLong(0), far.getLong(2)))
      val prev = state
      val next = state
        .withColumn("mind",
          least(col("mind"), codeSqDist(col("codes"), codeLit(far))))
      // Graph.scala's checkpoint policy: the per-round `withColumn`
      // grows the ANALYZED plan linearly in k (caching skips
      // re-execution, not re-planning), so every CheckpointEvery
      // rounds the lineage is cut to a leaf; depth stays O(N), total
      // planning O(k) instead of O(k²). Eager checkpoint doubles as
      // the materialization barrier.
      state =
        if (r % graft.util.LineageGuard.CheckpointEvery == 0)
          next.localCheckpoint(true)
        else {
          val c = next.cache(); c.count(); c
        }
      graft.util.LineageGuard.record("kCenterGreedy", state)
      prev.unpersist(blocking = false)
    }
    state.unpersist(blocking = false)
    codes.unpersist(blocking = false)
    sel.toSeq.toDF("sel_rank", "vec_id", "d2")
  }
}
