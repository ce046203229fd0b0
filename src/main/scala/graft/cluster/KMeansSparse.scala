package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.linalg.Sparse
import graft.linalg.Sparse.Vec

/** Cosine-similarity K-Means over sparse TF-IDF document vectors —
  * the reference's task2_2 (SURVEY §2.4 A7, §2.7 M2) restated: one
  * cached DataFrame of `(doc, vec: Map[String,Double])`, per-iteration
  * assignment via a broadcast closure, centroid means as a distributed
  * explode→groupBy with only k map-rows collected to the driver.
  *
  * The reference's loss accumulation bug (task2_2.java:288 —
  * `line_values` never cleared across reduce calls) is NOT replicated;
  * [[wssse]] computes the correct per-cluster sum (SURVEY §7.4.3).
  *
  * Scale: per iteration one shuffle keyed (cluster,term) with map-side
  * partial sums; driver state = k sparse centroids (must fit in the
  * broadcast — same constraint any K-Means at 100 TB has).
  */
object KMeansSparse {

  /** Add `cluster` = argmax cosine(vec, centroid); lowest index wins
    * ties (reference strict `>`, task2_2.java:272-279). Runs as a
    * native codegen'd expression (graft.functions.NearestCentroidCosine)
    * reading the MapData in place — no catalyst↔scala map conversion
    * per row per iteration; centroids ship inside the expression. */
  def assign(df: DataFrame, vecCol: String,
             centroids: IndexedSeq[Vec]): DataFrame =
    df.withColumn("cluster",
      graft.functions.SparseCosineFunctions
        .nearestCentroidCosine(col(vecCol), centroids))

  /** New centroids: element-wise Σw / clusterSize — absent terms count
    * as 0 in the mean (SURVEY A7; task2_2.java:294-346). Optional
    * `weightCol` generalizes to the K-Means‖ weighted mean
    * (SURVEY A8; task2_3.java:719-757): Σ weight·w / Σ weight. */
  def meanCentroids(assigned: DataFrame, vecCol: String, k: Int,
                    prev: IndexedSeq[Vec],
                    weightCol: Option[String] = None): IndexedSeq[Vec] = {
    val wcol = weightCol.map(col).getOrElse(lit(1.0))
    val sizes = assigned.groupBy(col("cluster"))
      .agg(sum(wcol).as("n"))
    val exploded = assigned
      .select(col("cluster"), wcol.as("pw"), explode(col(vecCol)).as(Seq("term", "w")))
    val means = exploded
      .groupBy(col("cluster"), col("term"))
      .agg(sum(col("pw") * col("w")).as("sw"))
      .join(sizes, "cluster")
      .withColumn("mw", col("sw") / col("n"))
      .groupBy(col("cluster"))
      .agg(map_from_entries(collect_list(struct(col("term"), col("mw")))).as("cvec"))
      .collect()
      .map(r => r.getInt(0) -> r.getMap[String, Double](1).toMap)
      .toMap
    (0 until k).map(i => means.getOrElse(i, prev(i)))
  }

  /** One-pass centroid means via the custom UDAF
    * (graft.functions.SparseMeanAggregator): no explode shuffle — map
    * buffers combine map-side, one sparse map per cluster crosses the
    * wire. Equivalent to [[meanCentroids]] (unweighted); preferred when
    * vectors are wide and the explode amplification dominates. */
  def meanCentroidsOnePass(assigned: DataFrame, vecCol: String, k: Int,
                           prev: IndexedSeq[Vec]): IndexedSeq[Vec] = {
    val meanVec = udaf(new graft.functions.SparseMeanAggregator)
    val means = assigned.groupBy(col("cluster"))
      .agg(meanVec(col(vecCol)).as("cvec"))
      .collect()
      .map(r => r.getInt(0) -> r.getMap[String, Double](1).toMap)
      .toMap
    (0 until k).map(i => means.getOrElse(i, prev(i)))
  }

  /** Top `n` terms per cluster by summed (pre-division) weight
    * (SURVEY T3; task2_2.java:319-331), deterministic tie-break on term. */
  def topTerms(assigned: DataFrame, vecCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("sw").desc, col("term"))
    assigned.select(col("cluster"), explode(col(vecCol)).as(Seq("term", "wt")))
      .groupBy(col("cluster"), col("term"))
      .agg(sum(col("wt")).as("sw"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
  }

  /** Correct WSSSE: Σ over members of sqDist(vec, centroid(cluster)) —
    * native codegen kernel (graft.functions.SqDistToCentroid). */
  def wssse(assigned: DataFrame, vecCol: String,
            centroids: IndexedSeq[Vec]): Double =
    assigned.select(sum(graft.functions.SparseCosineFunctions
        .sqDistToCentroid(col(vecCol), col("cluster"), centroids)).as("loss"))
      .collect()(0).getDouble(0)

  /** Lloyd loop; converges when cosine(old_i, new_i) ≥ `convSim` for all
    * i (reference 0.98, task2_2.java:594). Returns (centroids, iters). */
  def fit(df: DataFrame, vecCol: String, init: IndexedSeq[Vec],
          maxIter: Int, convSim: Double = 0.98): (IndexedSeq[Vec], Int) = {
    val cached = df.cache()
    var cs = init
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      // one-pass UDAF means: half the per-iteration wall time of the
      // explode→groupBy path (proven equal, SparseMeanAggregatorSpec)
      val next = meanCentroidsOnePass(assign(cached, vecCol, cs), vecCol, cs.length, cs)
      converged = cs.zip(next).forall { case (o, n) =>
        Sparse.cosine(o, n, round3 = false) >= convSim
      }
      cs = next
      it += 1
    }
    (cs, it)
  }

  /** Deterministic seeding: vectors of the k smallest doc ids (the
    * reference shuffles unseeded, task2_2.java:65 — SURVEY §7.4.4 makes
    * every random draw explicit; this is the simplest reproducible
    * choice for oracle-friendly tests). */
  def seedByMinId(df: DataFrame, idCol: String, vecCol: String,
                  k: Int): IndexedSeq[Vec] =
    df.orderBy(col(idCol)).limit(k).select(col(vecCol))
      .collect().map(_.getMap[String, Double](0).toMap).toIndexedSeq

  /** Seeded random sample init (SURVEY T6) — the reference's
    * `Collections.shuffle` (task2_2.java:65) with the explicit seed
    * SURVEY §7.4.4 mandates: shuffle by seeded rand, tie-broken by id
    * for a total order. */
  def seedRandom(df: DataFrame, idCol: String, vecCol: String, k: Int,
                 seed: Long): IndexedSeq[Vec] =
    df.orderBy(rand(seed), col(idCol)).limit(k).select(col(vecCol))
      .collect().map(_.getMap[String, Double](0).toMap).toIndexedSeq
}
