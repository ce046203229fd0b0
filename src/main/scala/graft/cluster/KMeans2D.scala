package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's K-Means on dense 2-D points (SURVEY §3.2; reference
  * task2_1.java re-run a full MapReduce job per iteration and moved
  * centroids through HDFS + the job Configuration).
  *
  * Spark restatement: points cached once; per iteration one
  * `groupBy(cluster).agg(avg)` job whose only driver↔executor data
  * motion is the `collect()` of k centroid rows. The nearest-centroid
  * assignment is generated as a pure column expression (`when` chain
  * over k literal centroids) — no UDF, stays in whole-stage codegen.
  *
  * Scale: state is O(k) on the driver; the per-iteration shuffle is a
  * partial-aggregated groupBy on k keys — bytes shuffled ≈ k × partitions,
  * independent of input rows. Holds at 100 TB.
  */
object KMeans2D {

  /** Squared Euclidean distance to a literal centroid, as a column. */
  private def sqDistTo(x: Column, y: Column, c: (Double, Double)): Column =
    (x - c._1) * (x - c._1) + (y - c._2) * (y - c._2)

  /** Argmin cluster index over literal centroids; ties resolve to the
    * lowest index (strict `<=` chain — mirror any SQL oracle exactly). */
  def assignExpr(x: Column, y: Column, cs: Seq[(Double, Double)]): Column = {
    val ds = cs.map(sqDistTo(x, y, _))
    ds.indices.init.foldRight(lit(ds.length - 1): Column) { (i, rest) =>
      val isMin = ds.drop(i + 1).map(d => ds(i) <= d).reduce(_ && _)
      when(isMin, lit(i)).otherwise(rest)
    }
  }

  /** points(xCol, yCol) + literal centroids → points with `cluster`. */
  def assign(points: DataFrame, xCol: String, yCol: String,
             cs: Seq[(Double, Double)]): DataFrame =
    points.withColumn("cluster", assignExpr(col(xCol), col(yCol), cs))

  /** SIMPLIFIED (centroid-based) SILHOUETTE per cluster — the O(n·k)
    * clustering-quality score production evals run where Rousseeuw
    * 1987's exact silhouette is O(n²): per point, a = distance to its
    * OWN (nearest) centroid, b = distance to the nearest OTHER
    * centroid, s = (b−a)/b (a ≤ b by construction of the nearest
    * assignment, so max(a,b) = b; coincident centroids ⇒ s = 0).
    * Cross-engine determinism: the squared distances are the same
    * IEEE expressions [[assignExpr]] compares, `sqrt` is correctly
    * rounded per IEEE-754 (bit-identical in any compliant engine),
    * s rounds to 9 decimals, and per-cluster means go through the
    * scaled-long path. One narrow map + one partial agg — no joins,
    * no shuffle beyond the k-row rollup.
    *
    * @return (cluster, n, mean_sil9) per non-empty cluster. */
  def silhouette(points: DataFrame, xCol: String, yCol: String,
                 cs: Seq[(Double, Double)]): DataFrame = {
    require(cs.length >= 2)
    val ds = cs.map(sqDistTo(col(xCol), col(yCol), _))
    val cluster = assignExpr(col(xCol), col(yCol), cs)
    def minOf(xs: Seq[Column]): Column = xs.reduce(least(_, _))
    val a2 = minOf(ds)
    val b2 = cs.indices.init.foldRight(minOf(ds.init)) { (i, rest) =>
      when(col("cluster") === i,
        minOf(ds.indices.filter(_ != i).map(ds))).otherwise(rest)
    }
    val s9 = when(b2 === 0.0, lit(0.0))
      .otherwise(round((sqrt(b2) - sqrt(a2)) / sqrt(b2), 9))
    points.withColumn("cluster", cluster)
      .withColumn("_s9", s9)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        graft.util.Exact.avgExact(col("_s9"), 9).as("mean_sil9"))
      .orderBy(col("cluster"))
  }

  /** One Lloyd iteration: new centroid = mean of members (SURVEY A6).
    * Empty clusters keep their previous centroid (Spark's groupBy just
    * omits them; reference behavior is the same — no reduce call). */
  def step(points: DataFrame, xCol: String, yCol: String,
           cs: IndexedSeq[(Double, Double)]): IndexedSeq[(Double, Double)] = {
    val means = assign(points, xCol, yCol, cs)
      .groupBy(col("cluster"))
      .agg(avg(col(xCol)).as("cx"), avg(col(yCol)).as("cy"))
      .collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    cs.indices.map(i => means.getOrElse(i, cs(i)))
  }

  /** One Lloyd iteration with bit-deterministic means: per-cluster
    * means via [[graft.util.Exact]] scaled-long sums — order-independent
    * under any partitioning, so an external SQL engine replaying the
    * same arithmetic produces the IDENTICAL double centroids. This is
    * what makes a fixed-iteration-count fit cross-engine checkable
    * (q94): with exact means, iteration i+1's assignment compares
    * bit-equal distances in both engines. */
  def stepExact(points: DataFrame, xCol: String, yCol: String,
                cs: IndexedSeq[(Double, Double)],
                scale: Int = 6): IndexedSeq[(Double, Double)] = {
    import graft.util.Exact
    val means = assign(points, xCol, yCol, cs)
      .groupBy(col("cluster"))
      .agg(Exact.avgExact(col(xCol), scale).as("cx"),
        Exact.avgExact(col(yCol), scale).as("cy"))
      .collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    cs.indices.map(i => means.getOrElse(i, cs(i)))
  }

  /** Full loop. Converges when every centroid moves ≤ `tol` (Euclidean,
    * reference threshold 0.5 — task2_1.java:99-130,354), or after
    * `maxIter`. Returns (centroids, iterations run). */
  def fit(points: DataFrame, xCol: String, yCol: String,
          init: IndexedSeq[(Double, Double)], maxIter: Int,
          tol: Double = 0.5): (IndexedSeq[(Double, Double)], Int) = {
    val cached = points.cache()
    var cs = init
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val next = step(cached, xCol, yCol, cs)
      converged = cs.zip(next).forall { case ((ax, ay), (bx, by)) =>
        math.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) <= tol
      }
      cs = next
      it += 1
    }
    (cs, it)
  }

  /** Full loop with bit-deterministic arithmetic end-to-end: every mean
    * goes through [[stepExact]]'s scaled-long sums and the convergence
    * test compares SQUARED movement against tol² (no sqrt — one fewer
    * op for an external engine to replay; with tol = 0.5 the threshold
    * 0.25 is exactly representable). Because each iteration's centroids
    * are bit-identical in any engine replaying the same arithmetic, the
    * convergence FLAG flips at the same iteration too — so the whole
    * convergence-driven loop (not just a fixed iteration count) is
    * cross-engine checkable: q119 unrolls this loop as DuckDB CTEs and
    * matches centroids AND the iteration count. */
  def fitExact(points: DataFrame, xCol: String, yCol: String,
               init: IndexedSeq[(Double, Double)], maxIter: Int,
               tol: Double = 0.5, scale: Int = 6): (IndexedSeq[(Double, Double)], Int) = {
    val cached = points.cache()
    var cs = init
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val next = stepExact(cached, xCol, yCol, cs, scale)
      converged = cs.zip(next).forall { case ((ax, ay), (bx, by)) =>
        (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= tol * tol
      }
      cs = next
      it += 1
    }
    (cs, it)
  }
}
