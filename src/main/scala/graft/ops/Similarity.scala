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

  /** Bit-deterministic dot product of two array<float>/<double> cols. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast("double") * y.cast("double") * Scale).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double") / Scale

  /** Bit-deterministic L2 norm. */
  def normExact(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => round(x.cast("double") * x.cast("double") * Scale).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double") / Scale)

  /** Deterministic cosine similarity between two embedding columns. */
  def cosineExact(a: Column, b: Column): Column =
    dotExact(a, b) / (normExact(a) * normExact(b))

  /** Exact top-k neighbors for each query row (brute force).
    * The query side is broadcast — keep it small; the corpus side
    * streams through without materializing the full cross product
    * thanks to the ranked-window filter.
    * Output: (query_id, rk, neighbor_id, cos). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineExact(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact,
    * quadratic — oracle/reference path; use LSH at scale). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosineExact(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Deterministic random hyperplanes: `planes` × `dim`, seeded. */
  def hyperplanes(planes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit LSH bucket id of an embedding under the given planes. */
  def bucketExpr(vecCol: Column, planes: Array[Array[Double]]): Column = {
    // bucket = Σ_p (dot(vec, plane_p) > 0) << p  — built from per-plane
    // dot products; planes are literals, so this is pure codegen'd math.
    planes.zipWithIndex.map { case (p, i) =>
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
      bucketExpr(col(vecCol), hp).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineExact(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .distinct()
  }
}
