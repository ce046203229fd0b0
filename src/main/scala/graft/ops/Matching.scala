package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Observational-study MATCHING — the causal-inference prep step an
  * experimentation platform runs when it can't randomize: each
  * treated unit pairs with its nearest control by a scalar score
  * (propensity score, spend, activity level) within a caliper, and
  * the downstream effect estimate compares matched pairs
  * (Rosenbaum & Rubin 1983's propensity matching; caliper rule from
  * Cochran & Rubin 1973).
  *
  * Plan shape — the [[RangeJoin]] banding argument applied to the
  * score axis: scores bucket by the caliper width, treated rows
  * fan out to their three adjacent buckets (any control within
  * ±caliper is within ±1 bucket), the join is a plain EQUI join on
  * the bucket, and a per-treated window picks the nearest candidate.
  * No inequality join, no cross product; candidate volume is bounded
  * by score density × caliper, not treated × control.
  *
  * Exactness: integer scores + integer caliper ⇒ the |Δ| comparison,
  * the caliper cut, and the (Δ, control id) tie-break are all
  * engine-exact. Greedy-with-replacement semantics (a control may
  * match several treated units — the standard default; sampling
  * without replacement needs a sequential pass no engine
  * parallelizes exactly).
  *
  * @return (treated_id, control_id, score_t, score_c, score_diff) —
  *         one row per treated unit that found a control within the
  *         caliper. */
object Matching {
  def nearestScoreMatch(treated: DataFrame, control: DataFrame,
                        idCol: String, scoreCol: String,
                        caliper: Long): DataFrame = {
    require(caliper >= 1)
    val t = treated.select(col(idCol).cast("long").as("treated_id"),
      col(scoreCol).cast("long").as("score_t"))
    val c = control.select(col(idCol).cast("long").as("control_id"),
        col(scoreCol).cast("long").as("score_c"))
      .withColumn("bkt", expr(s"score_c div ${caliper}L"))
    val tFan = t
      .withColumn("b0", expr(s"score_t div ${caliper}L"))
      .withColumn("bkt", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
      .drop("b0")
    val cand = tFan.join(c, Seq("bkt"))
      .withColumn("score_diff", abs(col("score_t") - col("score_c")))
      .filter(col("score_diff") <= caliper)
    val rk = Window.partitionBy(col("treated_id"))
      .orderBy(col("score_diff"), col("control_id"))
    cand.withColumn("_rk", row_number().over(rk))
      .filter(col("_rk") === 1)
      .select(col("treated_id"), col("control_id"),
        col("score_t"), col("score_c"), col("score_diff"))
  }
}
