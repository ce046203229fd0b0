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

  /** init + final standard loop (reference conv 0.9, task2_3.java:1332). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, l: Double,
          maxRounds: Int = 5, finalMaxIter: Int = 10,
          finalConv: Double = 0.9): (IndexedSeq[Vec], Int) = {
    val ir = init(df, idCol, vecCol, k, l, maxRounds)
    KMeansSparse.fit(df, vecCol, ir.centroids, finalMaxIter, finalConv)
  }
}
