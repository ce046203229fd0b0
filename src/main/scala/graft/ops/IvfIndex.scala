package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest-neighbor index — the
  * indexed scale path for similarity search (complements the
  * brute-force baseline and hyperplane LSH in [[Similarity]]):
  *
  *  1. train: k coarse centroids by Lloyd's over the (dense) embedding
  *     space, seeded sample init — O(k·d) driver state;
  *  2. index: each vector assigned to its nearest centroid → the
  *     partition-friendly `bucket` column (the inverted list);
  *  3. search: a query probes only its `nProbe` nearest lists —
  *     candidate set shrinks ~k/nProbe-fold vs brute force, recall
  *     degrades gracefully (tested against the exact top-k).
  *
  * At 100 TB the bucket column becomes the table's partition/bucket
  * key, so a probe touches only nProbe partitions (partition pruning
  * does the data skipping).
  */
object IvfIndex {
  type Centroid = Array[Double]

  private def sqDist(a: Seq[Float], c: Centroid): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { val d = a(i) - c(i); s += d * d; i += 1 }
    s
  }

  def nearestCentroid(v: Seq[Float], cs: Array[Centroid]): Int = {
    var best = 0; var bd = Double.MaxValue; var i = 0
    while (i < cs.length) {
      val d = sqDist(v, cs(i)); if (d < bd) { bd = d; best = i }; i += 1
    }
    best
  }

  /** Train k coarse centroids (seeded sample init + `iters` Lloyd
    * steps). Only k×d doubles ever reach the driver. */
  def train(df: DataFrame, vecCol: String, k: Int, iters: Int = 3,
            seed: Long = 42L): Array[Centroid] = {
    var cs = df.orderBy(rand(seed)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val cached = df.select(col(vecCol)).cache()
    for (_ <- 1 to iters) {
      val bc = cached.sparkSession.sparkContext.broadcast(cs)
      // asNondeterministic pins the UDF below the generate — otherwise
      // the projection above posexplode re-evaluates it once per
      // exploded element (64x per vector)
      val assignU = udf((v: Seq[Float]) => nearestCentroid(v, bc.value))
        .asNondeterministic()
      val means = cached
        .select(assignU(col(vecCol)).as("bucket"), col(vecCol))
        .select(col("bucket"), posexplode(col(vecCol)).as(Seq("i", "x")))
        .groupBy(col("bucket"), col("i"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val next = cs.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      cs = next
    }
    cs
  }

  /** Add the inverted-list `bucket` column. */
  def index(df: DataFrame, vecCol: String, cs: Array[Centroid]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(cs)
    val assignU = udf((v: Seq[Float]) => nearestCentroid(v, bc.value))
    df.withColumn("bucket", assignU(col(vecCol)))
  }

  /** Shared probe-join tail: probes = (query_id, bucket, qvec); the
    * query norm is computed ONCE per probe row (not per candidate
    * pair), the corpus norm once per corpus row. */
  private def probedTopK(indexed: DataFrame, probes: DataFrame, idCol: String,
                         vecCol: String, k: Int,
                         broadcastProbes: Boolean = true): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val probesN = probes
      .withColumn("qnorm", sqrt(Similarity.normSqExact(col("qvec"))))
    indexed.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        col("bucket"),
        sqrt(Similarity.normSqExact(col(vecCol))).as("cnorm"))
      .join(if (broadcastProbes) broadcast(probesN) else probesN, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        Similarity.dotExact(col("qvec"), col("cvec"))
          / (col("qnorm") * col("cnorm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))
  }

  /** Probed top-k search: each query joins only its nProbe nearest
    * lists. Queries are collected (the small side by contract) and the
    * (query, bucket) probe plan is broadcast. For query sides too big
    * to collect, use [[searchDistributed]]. */
  def search(indexed: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, cs: Array[Centroid], k: Int,
             nProbe: Int): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val qs = queries.select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val probes = qs.flatMap { case (qid, v) =>
      cs.indices.sortBy(i => sqDist(v, cs(i))).take(nProbe)
        .map(b => (qid, b, v.toArray))
    }.toSeq.toDF("query_id", "bucket", "qvec")
    probedTopK(indexed, probes, idCol, vecCol, k)
  }

  /** Probe-plan computed distributedly — no `queries.collect()`: the
    * k-row centroid table broadcasts against the query side, each
    * query ranks its centroid distances and keeps nProbe. The scale
    * path when the query side is itself a big DataFrame (batch ANN
    * joins); driver state stays O(k·d). */
  def searchDistributed(indexed: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, cs: Array[Centroid], k: Int,
                        nProbe: Int): DataFrame = {
    // Centroids enter as a LITERAL array generated per query row
    // (posexplode) rather than a k-row broadcast relation: a 1×k cross
    // join would plan as BroadcastNestedLoopJoin, while the generate is
    // joinless and keeps the probe-ranking stage a pure map+window.
    val csLit = typedlit(cs.map(_.toSeq).toSeq)
    // native codegen kernel (round-11, guide §4): the zip_with +
    // aggregate HOF fold ran interpreted per (query × centroid ×
    // dim); identical left-to-right IEEE sum
    val dist = graft.functions.VectorFunctions.sqDistPlain(
      col("qvec"), col("centroid"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("bucket"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .select(col("query_id"), col("qvec"),
        posexplode(csLit).as(Seq("bucket", "centroid")))
      .withColumn("dist", dist)
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("bucket"), col("qvec"))
    // the probe side scales with the query count here — shuffle-join
    // on bucket instead of broadcasting it (AQE may still pick
    // broadcast when the probe side turns out small)
    probedTopK(indexed, probes, idCol, vecCol, k, broadcastProbes = false)
  }

  /** train + index + search in one call. */
  def topK(df: DataFrame, queriesFilter: Column, idCol: String,
           vecCol: String, k: Int, lists: Int, nProbe: Int,
           seed: Long = 42L): DataFrame = {
    val cs = train(df, vecCol, lists, seed = seed)
    val indexed = index(df, vecCol, cs)
    search(indexed, df.filter(queriesFilter), idCol, vecCol, cs, k, nProbe)
  }

  /** PORTABLE probed top-k (the q47 entry point since round 9): same
    * IVF plan as [[topK]] — assignment to 1 of `lists` inverted lists,
    * probe join over only `nProbe` lists per query — but with a FIXED
    * deterministic codebook (the `lists` lowest-id vectors, the q266
    * discipline) and all-integer scaled-long centroid distances, so
    * the PRUNED path itself replays cross-engine: list assignment, the
    * probe set, the candidate join, and the final cosine ranking are
    * each an exact recurrence a SQL oracle reproduces bit-for-bit.
    * Lloyd-trained centroids ([[topK]]) give better list balance in
    * production; the full-probe q75/q93 anchors certify that path,
    * this one puts the PRUNING itself under the correctness gate. */
  def topKPortable(df: DataFrame, queriesFilter: Column, idCol: String,
                   vecCol: String, k: Int, lists: Int,
                   nProbe: Int): DataFrame = {
    require(lists >= 1 && nProbe >= 1 && nProbe <= lists)
    val cents = df.orderBy(col(idCol)).limit(lists)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
      .zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
    val csLit = typedlit(cents)
    val w = Window.partitionBy(col("id")).orderBy(col("d29"), col("bucket"))
    // one ranked table serves both sides: pr = 1 is the assignment,
    // pr <= nProbe the probe plan. d29 via the native kernel (same
    // HALF_UP rounding and fold order as the HOF form it replaces —
    // round-11, guide §4)
    val ranked = df
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        sqrt(Similarity.normSqExact(col(vecCol))).as("nrm"),
        queriesFilter.as("isq"))
      .select(col("id"), col("vec"), col("nrm"), col("isq"),
        explode(csLit).as("c"))
      .withColumn("d29", graft.functions.VectorFunctions.sqDistScaled9(
        col("vec"), col("c._2")))
      .select(col("id"), col("vec"), col("nrm"), col("isq"),
        col("c._1").as("bucket"), col("d29"))
      .withColumn("pr", row_number().over(w))
      // two consumers below; staged (round-12): O(n·centroids) rows
      .transform(graft.util.Snapshots.stage)
    val corpus = ranked.filter(col("pr") === 1)
      .select(col("bucket"), col("id").as("neighbor_id"),
        col("vec").as("cvec"), col("nrm").as("cnorm"))
    val queries = ranked.filter(col("isq") && col("pr") <= nProbe)
      .select(col("bucket"), col("id").as("query_id"),
        col("vec").as("qvec"), col("nrm").as("qnorm"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    // each corpus vector lives in exactly one list, so a query never
    // meets a candidate through two probes — no post-join dedup
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        Similarity.dotExact(col("qvec"), col("cvec"))
          / (col("qnorm") * col("cnorm")))
      .withColumn("rk", row_number().over(wq).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))
  }
}
