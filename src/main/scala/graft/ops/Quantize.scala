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
}
