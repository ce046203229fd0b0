package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.linalg.Sparse
import graft.linalg.Sparse.Vec

/** K-Means|| (scalable k-means++, Bahmani et al. VLDB'12) initialization
  * with the reference's deviations preserved (SURVEY §2.5 T4, §7.4.5):
  * candidates are chosen as the deterministic top-⌊l⌋ by probability
  * p = l·d²min/ψ, NOT Bernoulli-sampled (task2_3.java:326-339), and the
  * candidate set is then weighted (points voting for their nearest
  * candidate by cosine, task2_3.java:513-559) and re-clustered to k
  * centroids with a weight-weighted mean (task2_3.java:719-757).
  *
  * The reference runs ≥1 full MapReduce job per numbered phase with HDFS
  * round-trips (SURVEY §3.3); here each phase is an action over one
  * cached DataFrame and only O(k·l) candidate rows ever reach the driver.
  */
object KMeansParallel {

  /** Σ min-sqdist to the candidate set (ψ — cost of C,
    * task2_3.java:215-232,342-366). Native codegen kernel
    * (graft.functions.MinSqDistCentroids), not a UDF. */
  def cost(df: DataFrame, vecCol: String, centroids: IndexedSeq[Vec]): Double =
    df.select(sum(graft.functions.SparseCosineFunctions
        .minSqDistCentroids(col(vecCol), centroids)).as("psi"))
      .collect()(0).getDouble(0)

  /** One oversampling round: top-⌊l⌋ points by p = l·d²min/ψ
    * (task2_3.java:279-297,326-339), deterministic tie-break on id. */
  def candidateRound(df: DataFrame, idCol: String, vecCol: String,
                     centroids: IndexedSeq[Vec], l: Double,
                     psi: Double): Array[(Long, Vec)] = {
    val mind = graft.functions.SparseCosineFunctions
      .minSqDistCentroids(col(vecCol), centroids)
    df.withColumn("p", mind * l / psi)
      .orderBy(col("p").desc, col(idCol))
      .limit(l.toInt)
      .select(col(idCol), col(vecCol))
      .collect()
      .map(r => r.getLong(0) -> r.getMap[String, Double](1).toMap)
  }

  /** Candidate weights: #points whose nearest (cosine) candidate is c
    * (SURVEY A11; task2_3.java:485-564). Returns one weight per
    * candidate index, 0 for unvoted candidates. */
  def weights(df: DataFrame, vecCol: String,
              candidates: IndexedSeq[Vec]): IndexedSeq[Double] = {
    val counts = KMeansSparse.assign(df, vecCol, candidates)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    candidates.indices.map(i => counts.getOrElse(i, 0.0))
  }

  /** Result of [[init]]: the oversampled candidate set and the k
    * reclustered starting centroids. */
  final case class InitResult(candidates: IndexedSeq[(Long, Vec)],
                              weights: IndexedSeq[Double],
                              centroids: IndexedSeq[Vec],
                              rounds: Int, psiTrace: Seq[Double])

  /** Full K-Means|| initialization.
    * @param l oversampling factor (candidates per round)
    * @param maxRounds cap on ⌈ln ψ⌉ rounds (task2_3.java:1251-1253) */
  def init(df: DataFrame, idCol: String, vecCol: String, k: Int, l: Double,
           maxRounds: Int = 5, reclusterConv: Double = 0.8,
           reclusterMaxIter: Int = 10): InitResult = {
    val cached = df.cache()
    // Phase 1: deterministic seed — the min-id vector (reference seeds
    // with one unseeded-random point, task2_3.java:1248).
    val seed = cached.orderBy(col(idCol)).limit(1)
      .select(col(idCol), col(vecCol)).collect()
      .map(r => r.getLong(0) -> r.getMap[String, Double](1).toMap)
    var cands = seed.toIndexedSeq
    var psi = cost(cached, vecCol, cands.map(_._2))
    val psiTrace = scala.collection.mutable.ArrayBuffer(psi)
    // Phase 2: ⌈ln ψ⌉ oversampling rounds, capped.
    val rounds = math.min(maxRounds, math.max(1, math.ceil(math.log(psi)).toInt))
    var r = 0
    while (r < rounds && psi > 0) {
      val add = candidateRound(cached, idCol, vecCol, cands.map(_._2), l, psi)
      val known = cands.map(_._1).toSet
      cands = cands ++ add.filterNot(c => known.contains(c._1))
      psi = cost(cached, vecCol, cands.map(_._2))
      psiTrace += psi
      r += 1
    }
    // Phase 3: weights = votes per candidate.
    val ws = weights(cached, vecCol, cands.map(_._2))
    // Phase 4: weighted recluster of the candidates themselves down to k
    // (driver-side — the candidate set is O(k·l), tiny by construction;
    // the reference burns a MapReduce job per iteration on it).
    val centroids = recluster(cands.map(_._2), ws, k, reclusterConv, reclusterMaxIter)
    InitResult(cands, ws, centroids, rounds, psiTrace.toSeq)
  }

  /** Weighted Lloyd on the candidate set (cosine assignment, weighted
    * mean — SURVEY A8), init = first k candidates, converge when all
    * cosine(old,new) ≥ `conv` (reference 0.8, task2_3.java:1293). */
  def recluster(cands: IndexedSeq[Vec], ws: IndexedSeq[Double], k: Int,
                conv: Double, maxIter: Int): IndexedSeq[Vec] = {
    var cs = cands.take(k)
    var it = 0
    var done = false
    while (it < maxIter && !done) {
      val assignIdx = cands.map(Sparse.nearestByCosine(_, cs))
      val next = (0 until k).map { c =>
        val members = cands.indices.filter(assignIdx(_) == c)
        val wsum = members.map(ws).sum
        if (wsum == 0.0) cs(c)
        else members.foldLeft(Map.empty[String, Double]) { (acc, i) =>
          val w = ws(i)
          cands(i).foldLeft(acc) { case (m, (t, v)) =>
            m.updated(t, m.getOrElse(t, 0.0) + w * v)
          }
        }.map { case (t, v) => t -> v / wsum }
      }
      done = cs.zip(next).forall { case (o, n) =>
        Sparse.cosine(o, n, round3 = false) >= conv }
      cs = next
      it += 1
    }
    cs
  }

  /** One weighted-recluster round as a DISTRIBUTED DataFrame computation
    * with bit-deterministic arithmetic — phase 4 of K-Means‖ in the shape
    * it takes when the candidate set is too large for the driver (the
    * 100 TB path), and the value-level oracle anchor for [[recluster]]'s
    * arithmetic (q120; semantics from task2_3.java:719-757).
    *
    * Input: exploded candidate table (cand_idx, w, term, v) — one row per
    * nonzero term, w = the candidate's vote weight (integral), cand_idx
    * dense from 0. Centroids = candidates 0..k-1 ([[recluster]]'s init).
    *
    * Arithmetic is order-independent end-to-end so any engine replaying
    * it produces identical bits: dot products and squared norms are
    * scaled-long sums at 1e9 (graft.util.Exact), cosine is rounded to 3
    * decimals (the reference's task2_2.java:179 convention — matching
    * [[graft.linalg.Sparse.cosine]]), assignment is first-max-wins
    * (strict `>` ⇒ lowest index on ties, task2_2.java:272-279), and the
    * weighted mean is Σ round(w·v·1e9) / (Σw · 1e9) per (cluster, term).
    * Empty clusters keep their centroid's own vector, like [[recluster]].
    *
    * Returns (cluster, term, weight) rows. Scale: one equi-join on term
    * against a k-row broadcast side + two key shuffles; no driver state.
    */
  def reclusterRoundExact(exploded: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val S = 1000000000L // 1e9 scale for dot/norm/mean sums
    val cents = exploded.filter(col("cand_idx") < k)
      .select(col("cand_idx").as("cidx"), col("term"), col("v").as("cv"))
    // squared norms, scaled-long: norm = sqrt(nsq9 / 1e9)
    def nsq(df: DataFrame, idCol: String, vCol: String, out: String) =
      df.groupBy(col(idCol))
        .agg(sum(round(col(vCol) * col(vCol) * S).cast("long")).as(out))
    val candNorm = nsq(exploded, "cand_idx", "v", "nsq9")
    val centNorm = nsq(cents, "cidx", "cv", "cnsq9")
    // dot products over shared terms (cands with NO shared term get no
    // row — restored as dot 0 by the cross-join + left-join below)
    val dots = exploded.join(broadcast(cents), "term")
      .groupBy(col("cand_idx"), col("cidx"))
      .agg(sum(round(col("v") * col("cv") * S).cast("long")).as("dot9"))
    // full (cand × centroid) pair grid WITHOUT a nested-loop join:
    // explode a k-element literal per candidate, then equi-join the
    // centroid norms — plans as a broadcast HASH join on cidx
    val pairs = candNorm
      .withColumn("cidx", explode(lit((0L until k.toLong).toArray)))
      .join(broadcast(centNorm), "cidx")
      .join(dots, Seq("cand_idx", "cidx"), "left")
      .withColumn("cos", round(
        (coalesce(col("dot9"), lit(0L)).cast("double") / S) /
          (sqrt(col("nsq9").cast("double") / S) *
            sqrt(col("cnsq9").cast("double") / S)) * 1000) / 1000)
    val wA = Window.partitionBy(col("cand_idx"))
      .orderBy(col("cos").desc, col("cidx"))
    val assign = pairs.withColumn("rk", row_number().over(wA))
      .filter(col("rk") === 1)
      .select(col("cand_idx"), col("cidx").as("cluster"))
    // per-candidate weight (constant across its exploded rows)
    val cw = exploded.groupBy(col("cand_idx")).agg(first(col("w")).as("w"))
    val members = assign.join(cw, "cand_idx")
    val wsums = members.groupBy(col("cluster")).agg(sum(col("w")).as("wsum"))
    val means = exploded.drop("w")
      .join(members.select(col("cand_idx"), col("cluster"), col("w")), "cand_idx")
      .groupBy(col("cluster"), col("term"))
      .agg(sum(round(col("w") * col("v") * S).cast("long")).as("s9"))
      .join(wsums, "cluster")
      .filter(col("wsum") > 0)
      .select(col("cluster"),
        col("term"),
        (col("s9").cast("double") / (col("wsum") * S.toDouble)).as("weight"))
    // empty clusters (no members, or all-zero member weight — the
    // wsum == 0 branch of [[recluster]]): keep the centroid's vector
    val nonEmpty = wsums.filter(col("wsum") > 0).select(col("cluster"))
    val empties = cents.join(nonEmpty, cents("cidx") === nonEmpty("cluster"), "left_anti")
      .select(col("cidx").as("cluster"), col("term"), col("cv").as("weight"))
    means.unionByName(empties)
  }

  /** EXACT K-Means‖ initialization with FIXED oversampling rounds —
    * the oracle-checkable redeclaration of [[init]] (q24, round-10):
    * same phases (min-id seed → oversampling rounds → vote weights),
    * with the two sources of unreplayability removed.
    *
    *  - SELECTION IS INTEGER-EXACT WITHOUT ψ: within a round, ranking
    *    by p = l·d²/ψ is the same total order as ranking by d² alone
    *    (l/ψ is one positive constant), and the sparse squared
    *    distance is exactly d9 = nsq9 + cnsq9 − 2·dot9 over scaled-
    *    long sums — so the top-⌊l⌋ cut (d9min DESC, id ASC, the
    *    reference's deterministic tie-break) needs no division and no
    *    float anywhere. ψ itself is never computed.
    *  - ROUNDS ARE PINNED instead of ⌈ln ψ⌉-adaptive (the reference
    *    caps at maxRounds anyway and every probed corpus saturates
    *    the cap; pinning removes the one libm call from the surface).
    *
    * Per round, the reference's exact shape: the top cut ranks ALL
    * docs (existing candidates score d9min = 0 and sink), then known
    * ids drop — so a round can add fewer than `l`. Weights are the
    * exact round-3 cosine argmax ([[KMeansSparse.assignExactFrames]])
    * against candidates in INSERTION order (seed, then each round's
    * adds in cut order), first-max-wins — task2_3.java:485-564's
    * semantics under the q120 arithmetic. Driver state is the O(k·l)
    * candidate id list (the standing contract of [[init]]).
    *
    * @param exploded doc vectors as (id, term, v) rows.
    * @return (cand_id, weight, rounds, n_candidates), one row per
    *         candidate; weight = votes (0 for unvoted). */
  def initExactFixedRounds(exploded: DataFrame, l: Int,
                           rounds: Int): DataFrame = {
    require(l >= 1 && rounds >= 1)
    val S = 1000000000L
    val spark = exploded.sparkSession
    import spark.implicits._
    // NOT snapshotted (round-11, measured): callers pass an explode
    // over an already-cached vector table, so re-deriving ex per
    // consumer is a narrow in-memory read — an eager snapshot of the
    // full nnz-row matrix costs MORE than it saves (q24 3.07→5.26 s
    // when tried; the bounded nrm/centroid tables are what snapshot)
    val ex = exploded.select(col("id"), col("term"), col("v"))
    val nrm = ex.groupBy(col("id"))
      .agg(sum(round(col("v") * col("v") * S).cast("long")).as("nsq9"))
      // staged (round-12): O(docs) rows — lineage kept for
      // recompute-on-loss; see graft.util.Snapshots
      .transform(graft.util.Snapshots.stage)
    val seed = nrm.agg(min(col("id"))).first().getLong(0)
    // (id, round added, d9min at selection) in insertion order
    var cands = Vector[(Long, Int, Long)]((seed, 0, 0L))
    for (r <- 1 to rounds) {
      val ids = cands.map(_._1)
      val centRows = ex.filter(col("id").isin(ids: _*))
        .select(col("id").as("cid"), col("term"), col("v").as("cv"))
      val cnrm = centRows.groupBy(col("cid"))
        .agg(sum(round(col("cv") * col("cv") * S).cast("long")).as("cnsq9"))
      val dots = ex.join(broadcast(centRows), "term")
        .groupBy(col("id"), col("cid"))
        .agg(sum(round(col("v") * col("cv") * S).cast("long")).as("dot9"))
      val dmin = nrm
        .withColumn("cid", explode(lit(ids.toArray)))
        .join(broadcast(cnrm), "cid")
        .join(dots, Seq("id", "cid"), "left")
        .select(col("id"), (col("nsq9") + col("cnsq9")
          - lit(2L) * coalesce(col("dot9"), lit(0L))).as("d9"))
        .groupBy(col("id")).agg(min(col("d9")).as("d9min"))
      val top = dmin.orderBy(col("d9min").desc, col("id")).limit(l)
        .collect().map(rw => (rw.getLong(0), rw.getLong(1)))
      val known = cands.map(_._1).toSet
      cands = cands ++ top.filterNot(t => known(t._1))
        .map { case (id, d) => (id, r, d) }
    }
    val centIdx = cands.zipWithIndex
      .map { case ((id, _, _), i) => (id, i.toLong) }.toDF("cid", "cidx")
    val cents = ex.join(broadcast(centIdx), ex("id") === centIdx("cid"))
      .select(col("cidx"), col("term"), col("v").as("cv"))
    // reuse the norm snapshot — assignExactFrames would re-run the
    // O(nnz) docNorms shuffle the loop already paid for (round-11)
    val votes = KMeansSparse.assignExactFramesPre(nrm, ex, cents, cands.size)
      .groupBy(col("cluster")).agg(count(lit(1)).as("w"))
    centIdx.join(votes, centIdx("cidx") === votes("cluster"), "left")
      .select(col("cid").as("cand_id"),
        coalesce(col("w"), lit(0L)).as("weight"),
        lit(rounds.toLong).as("rounds"),
        lit(cands.size.toLong).as("n_candidates"))
  }

  /** init + final standard loop (reference conv 0.9, task2_3.java:1332). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, l: Double,
          maxRounds: Int = 5, finalMaxIter: Int = 10,
          finalConv: Double = 0.9): (IndexedSeq[Vec], Int) = {
    val ir = init(df, idCol, vecCol, k, l, maxRounds)
    KMeansSparse.fit(df, vecCol, ir.centroids, finalMaxIter, finalConv)
  }
}
