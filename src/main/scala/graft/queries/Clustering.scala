package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.text.{Tokenizer, TfIdf}
import graft.cluster.{KMeans2D, KMeansSparse, KMeansParallel}

/** K-Means coverage (SURVEY §2 A6-A12, M1-M3, T3-T6; reference Part 2).
  *
  * q20 (single assignment step against literal centroids) is fully
  * SQL-expressible and oracle-checked — it pins the distance kernel and
  * tie-break semantics. The iterative fits (q21-q24) are driver-loop
  * algorithms with no SQL equivalent → rows-only checks, with invariants
  * covered in ClusterSpec.
  */
object Clustering {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic 2-D point set derived from `customer`. */
  private def points2d(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_acctbal").as("x"),
      (col("c_custkey") % 100).cast("double").as("y"))

  private val InitCentroids = IndexedSeq((0.0, 50.0), (4000.0, 20.0), (9000.0, 80.0))

  // Doc vectors feed three K-Means queries — materialized once per
  // (session, dir), like the reference's persisted TFIDF.txt input that
  // every KMeans task re-reads.
  private val dvCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** TF-IDF doc vectors (term → weight map) for the documents corpus. */
  def docVectors(s: SparkSession, d: String): DataFrame =
    dvCache.getOrElseUpdate((s, d), {
      val fc = TextQueries.filteredCounts(s, d)
      // coalesce: the vector table is small (one row per doc) and feeds
      // ~10 short actions per K-Means run — right-sizing partitions
      // cuts per-action task overhead (what AQE does for shuffles)
      TfIdf.docVectors(
        TfIdf.tfidf(TfIdf.tf(fc, "doc_id"), TfIdf.idf(fc, "doc_id")), "doc_id")
        .coalesce(8)
        .cache()
    })

  /** Drop the memoized doc-vector table and unpersist its cache (see
    * graft.util.Caches). */
  private[graft] def clearMemo(): Unit = {
    dvCache.values.foreach(_.unpersist(blocking = false))
    dvCache.clear()
  }

  val queries: Map[String, Q] = Map(
    // M1+J5+A6 pinned by oracle: one Euclidean assignment step against
    // literal centroids, per-cluster count/mean (reference task2_1's
    // mapper+reducer as a single codegen'd expression — no UDF).
    "q20_kmeans_assign_step" -> ((s, d) => {
      KMeans2D.assign(points2d(s, d), "x", "y", InitCentroids)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("x") * 100).cast("long")).cast("double")
            / (count(lit(1)) * 100.0)).as("mean_x"),
          (sum(col("y")) / count(lit(1))).as("mean_y"))
        .orderBy(col("cluster"))
    }),

    // TWO exact Lloyd iterations, cross-engine checkable: iteration-1
    // means go through scaled-long sums (order-independent ⇒ both
    // engines compute bit-identical centroid doubles), iteration 2
    // re-assigns against those centroids and rolls up — so the
    // iterative loop's arithmetic (assign → mean → re-assign) gets a
    // full value-level oracle beyond the rows-only q21 fit.
    "q94_kmeans_two_steps" -> ((s, d) => {
      import graft.util.Exact
      val pts = points2d(s, d)
      val c1 = KMeans2D.stepExact(pts, "x", "y", InitCentroids)
      KMeans2D.assign(pts, "x", "y", c1)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          Exact.avgExact(col("x"), 6).as("mean_x"),
          Exact.avgExact(col("y"), 6).as("mean_y"))
        .orderBy(col("cluster"))
    }),

    // Full Lloyd's loop (§3.2): O(k) driver state, one tiny-shuffle agg
    // per iteration. Output = final centroids; rows-only check.
    "q21_kmeans_2d" -> ((s, d) => {
      val (cs, iters) = KMeans2D.fit(points2d(s, d), "x", "y",
        InitCentroids, maxIter = 10, tol = 0.5)
      val rows = cs.zipWithIndex.map { case ((x, y), i) =>
        (i, math.rint(x * 10000) / 10000, math.rint(y * 10000) / 10000, iters)
      }
      import s.implicits._
      rows.toDF("cluster", "cx", "cy", "iters").orderBy(col("cluster"))
    }),

    // Cosine K-Means over sparse TF-IDF vectors (task2_2): deterministic
    // min-id seeding, conv 0.98. Output = cluster sizes.
    "q22_kmeans_sparse" -> ((s, d) => {
      val dv = docVectors(s, d)
      val init = KMeansSparse.seedByMinId(dv, "doc_id", "vec", 4)
      val (cs, _) = KMeansSparse.fit(dv, "vec", init, maxIter = 5)
      KMeansSparse.assign(dv, "vec", cs)
        .groupBy(col("cluster")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("cluster"))
    }),

    // T3: top-5 terms per cluster by summed pre-division weight.
    "q23_kmeans_topterms" -> ((s, d) => {
      val dv = docVectors(s, d)
      val init = KMeansSparse.seedByMinId(dv, "doc_id", "vec", 4)
      val (cs, _) = KMeansSparse.fit(dv, "vec", init, maxIter = 3)
      KMeansSparse.topTerms(KMeansSparse.assign(dv, "vec", cs), "vec", 5)
        .select(col("cluster"), col("rk"), col("term"))
        .orderBy(col("cluster"), col("rk"))
    }),

    // K-Means|| init (task2_3): candidates, weights, ψ trace.
    "q24_kmeans_parallel" -> ((s, d) => {
      val dv = docVectors(s, d)
      val ir = KMeansParallel.init(dv, "doc_id", "vec", k = 4, l = 8.0,
        maxRounds = 3)
      val rows = ir.candidates.zip(ir.weights).map { case ((id, _), w) =>
        (id, w, ir.rounds, ir.candidates.size)
      }
      import s.implicits._
      rows.toDF("cand_id", "weight", "rounds", "n_candidates")
        .orderBy(col("cand_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q20_kmeans_assign_step" ->
      """WITH pts AS (
        |  SELECT c_acctbal AS x, CAST(c_custkey % 100 AS DOUBLE) AS y FROM customer
        |), a AS (
        |  SELECT x, y,
        |    (x-0.0)*(x-0.0)+(y-50.0)*(y-50.0) AS d0,
        |    (x-4000.0)*(x-4000.0)+(y-20.0)*(y-20.0) AS d1,
        |    (x-9000.0)*(x-9000.0)+(y-80.0)*(y-80.0) AS d2
        |  FROM pts)
        |SELECT CASE WHEN d0<=d1 AND d0<=d2 THEN 0 WHEN d1<=d2 THEN 1 ELSE 2 END AS cluster,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(x*100) AS BIGINT)) AS DOUBLE)/(count(*)*100.0) AS mean_x,
        |  sum(y)/count(*) AS mean_y
        |FROM a GROUP BY 1 ORDER BY cluster""".stripMargin,
    // Mirrors q94 operation-for-operation: same assignment tie-break
    // chain (lowest index wins on <=), same scaled-long means (scale
    // 6) — the division CAST(sum AS DOUBLE)/(count*1000000.0) is the
    // identical IEEE sequence, so iteration-2 distances compare
    // bit-equal doubles. Empty clusters fall back to their previous
    // centroid (the VALUES left join), as in KMeans2D.stepExact.
    "q94_kmeans_two_steps" ->
      """WITH pts AS (
        |  SELECT c_acctbal AS x, CAST(c_custkey % 100 AS DOUBLE) AS y FROM customer
        |), a1 AS (
        |  SELECT x, y, CASE WHEN d0<=d1 AND d0<=d2 THEN 0 WHEN d1<=d2 THEN 1 ELSE 2 END AS cluster
        |  FROM (SELECT x, y,
        |    (x-0.0)*(x-0.0)+(y-50.0)*(y-50.0) AS d0,
        |    (x-4000.0)*(x-4000.0)+(y-20.0)*(y-20.0) AS d1,
        |    (x-9000.0)*(x-9000.0)+(y-80.0)*(y-80.0) AS d2 FROM pts)
        |), m1 AS (
        |  SELECT cluster,
        |    CAST(sum(CAST(round(x*1000000) AS BIGINT)) AS DOUBLE)/(count(*)*1000000.0) AS cx,
        |    CAST(sum(CAST(round(y*1000000) AS BIGINT)) AS DOUBLE)/(count(*)*1000000.0) AS cy
        |  FROM a1 GROUP BY cluster
        |), c1 AS (
        |  SELECT i.cluster, coalesce(m1.cx, i.cx) AS cx, coalesce(m1.cy, i.cy) AS cy
        |  FROM (VALUES (0, 0.0, 50.0), (1, 4000.0, 20.0), (2, 9000.0, 80.0)) AS i(cluster, cx, cy)
        |  LEFT JOIN m1 ON m1.cluster = i.cluster
        |), cs AS (
        |  SELECT
        |    max(CASE WHEN cluster=0 THEN cx END) AS cx0, max(CASE WHEN cluster=0 THEN cy END) AS cy0,
        |    max(CASE WHEN cluster=1 THEN cx END) AS cx1, max(CASE WHEN cluster=1 THEN cy END) AS cy1,
        |    max(CASE WHEN cluster=2 THEN cx END) AS cx2, max(CASE WHEN cluster=2 THEN cy END) AS cy2
        |  FROM c1
        |), a2 AS (
        |  SELECT x, y, CASE WHEN d0<=d1 AND d0<=d2 THEN 0 WHEN d1<=d2 THEN 1 ELSE 2 END AS cluster
        |  FROM (SELECT x, y,
        |    (x-cx0)*(x-cx0)+(y-cy0)*(y-cy0) AS d0,
        |    (x-cx1)*(x-cx1)+(y-cy1)*(y-cy1) AS d1,
        |    (x-cx2)*(x-cx2)+(y-cy2)*(y-cy2) AS d2 FROM pts CROSS JOIN cs)
        |)
        |SELECT cluster, count(*) AS n,
        |  CAST(sum(CAST(round(x*1000000) AS BIGINT)) AS DOUBLE)/(count(*)*1000000.0) AS mean_x,
        |  CAST(sum(CAST(round(y*1000000) AS BIGINT)) AS DOUBLE)/(count(*)*1000000.0) AS mean_y
        |FROM a2 GROUP BY cluster ORDER BY cluster""".stripMargin
  )
}
