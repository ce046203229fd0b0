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

  /** FELLEGI–SUNTER probabilistic record-linkage scoring (JASA 1969)
    * — the decision layer on top of the block→verify joins (q82 edit
    * distance, q117 Jaro–Winkler): each candidate pair gets the
    * log-likelihood-ratio score Σ_f ln(m_f/u_f) over agreeing fields
    * + Σ_f ln((1−m_f)/(1−u_f)) over disagreeing ones, where m_f
    * (P(agree | match)) is pinned per field and u_f
    * (P(agree | non-match)) is estimated EMPIRICALLY from the
    * candidate pairs themselves in one aggregate pass — the standard
    * practical estimator (random pairs are overwhelmingly non-match).
    *
    * Determinism: u_f = agree_f/t enters as one exact double
    * division, each of the 2·|fields| weights is a per-RUN SCALAR
    * (ln round-9 → scaled long, the standing libm guard), and the
    * pair score is an exact long sum of those scalars — so ranking
    * ties cannot exist between different agreement patterns and the
    * whole score surface replays cross-engine.
    *
    * Shape: one agg over the pairs (t, Σ agree_f), broadcast back as
    * a 1-row frame, per-pair score = codegen CASE sum. The caller
    * owns blocking; this never joins.
    *
    * @param pairs  pre-blocked candidate pairs with BOOLEAN agreement
    *               columns.
    * @param fields (agreeCol → pinned m_f) — m_f ∈ (0,1); u_f must
    *               land strictly inside (0,1) for every field
    *               (guarded with raise_error, since ln(0) poisons
    *               every score).
    * @return pairs + score9 (scaled-long log-likelihood ratio). */
  def fellegiSunter(pairs: DataFrame, fields: Seq[(String, Double)])
      : DataFrame = {
    require(fields.nonEmpty && fields.forall(f => f._2 > 0 && f._2 < 1))
    val totals = pairs.agg(
      count(lit(1)).as("t"),
      fields.map { case (f, _) =>
        sum(when(col(f), 1L).otherwise(0L)).as(s"a_$f") }: _*)
    def w9(c: org.apache.spark.sql.Column) =
      graft.util.Exact.scaled(round(log(c), 9), 9)
    val scored = pairs.crossJoin(broadcast(totals))
    val uOk = fields.map { case (f, _) =>
      col(s"a_$f") > 0 && col(s"a_$f") < col("t") }.reduce(_ && _)
    val score = fields.map { case (f, m) =>
      val u = col(s"a_$f").cast("double") / col("t").cast("double")
      when(col(f), w9(lit(m) / u)).otherwise(w9(lit(1.0 - m) / (lit(1.0) - u)))
    }.reduce(_ + _)
    scored
      .withColumn("score9", when(!uOk, raise_error(lit(
        "fellegiSunter: a field's empirical u is 0 or 1 — ln diverges")))
        .otherwise(score))
      .drop((Seq("t") ++ fields.map(f => s"a_${f._1}")): _*)
  }
}
