package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY scale notes; builder-prompt
  * "salting for skew"). AQE's skew-join splitting handles joins at
  * runtime; hot-key AGGREGATIONS are salted explicitly: a two-stage
  * aggregate where stage 1 fans each hot key out over `salts` random
  * partials and stage 2 merges them — the shuffle before stage 1 is
  * uniform even when one key holds most rows.
  *
  * Works for any algebraic aggregate (sum/count/min/max); pass the
  * partial and merge forms explicitly.
  */
object Skew {

  /** Salted two-stage aggregation.
    * @param partials stage-1 aggregates over (keys + salt)
    * @param merges   stage-2 merges of the partial columns */
  def saltedAgg(df: DataFrame, keys: Seq[Column], salts: Int,
                partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.withColumn("_salt", (rand(42L) * salts).cast("int"))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(merges.head, merges.tail: _*)

  /** Salted count per key — count is algebraic: partial counts then a
    * sum merge. Result is identical to `groupBy(keys).count()`; the
    * plan shuffles `salts`× more keys but no single reducer sees a hot
    * key's full row set. */
  def saltedCount(df: DataFrame, keys: Seq[Column], salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      partials = Seq(count(lit(1)).as("_pc")),
      merges = Seq(sum(col("_pc")).as("cnt")))

  /** Salted sum of a scaled-long column (deterministic — long sums are
    * associative/commutative, so salting cannot change the result). */
  def saltedLongSum(df: DataFrame, keys: Seq[Column], value: Column,
                    salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      partials = Seq(sum(value).as("_ps")),
      merges = Seq(sum(col("_ps")).as("sum_value")))
}
