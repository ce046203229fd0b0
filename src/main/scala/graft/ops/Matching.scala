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
    * Shape: one agg over the pairs (t, Σ agree_f) collected as the
    * 1-row model, then the scoring pass is pure codegen over literal
    * weights. The caller owns blocking; this never joins.
    *
    * @param pairs  pre-blocked candidate pairs with BOOLEAN agreement
    *               columns.
    * @param fields (agreeCol → pinned m_f) — m_f ∈ (0,1); u_f must
    *               land strictly inside (0,1) for every field
    *               (require-guarded, since ln(0) poisons every
    *               score).
    * @return pairs + score9 (scaled-long log-likelihood ratio). */
  def fellegiSunter(pairs: DataFrame, fields: Seq[(String, Double)])
      : DataFrame = {
    require(fields.nonEmpty && fields.forall(f => f._2 > 0 && f._2 < 1))
    // ONE aggregate action materializes the totals (a 1-row O(fields)
    // result — the same O(1) driver-state contract as a K-Means
    // model), so the 2·|fields| weights become LITERALS in the scoring
    // pass: per pair the score is then boolean branches + long adds.
    // (The first cut attached the totals by broadcast cross join and
    // evaluated round(ln(m/u))·10⁹ PER PAIR PER FIELD — 6 ln+decimal
    // ops × 9M pairs dominated the wall at 15 of 19 s.)
    // snapshot: the caller's blocked pair join would otherwise re-run
    // end-to-end for the scoring pass (totals is an action). Staged
    // (round-12): O(blocked pairs), lineage kept
    val p = graft.util.Snapshots.stage(pairs)
    val trow = p.agg(
      count(lit(1)).as("t"),
      fields.map { case (f, _) =>
        sum(when(col(f), 1L).otherwise(0L)).as(s"a_$f") }: _*)
      .first()
    val t = trow.getLong(0)
    // mirrors Exact.scaled(round(log(x), 9), 9) bit for bit: the same
    // IEEE division/log, HALF_UP at 9 decimals, then the 1e9 scale
    def w9(x: Double): Long = math.round(
      BigDecimal(math.log(x)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble * 1e9)
    val score = fields.zipWithIndex.map { case ((f, m), i) =>
      val a = trow.getLong(i + 1)
      require(a > 0 && a < t,
        s"fellegiSunter: field '$f' empirical u is 0 or 1 — ln diverges")
      val u = a.toDouble / t.toDouble
      when(col(f), lit(w9(m / u))).otherwise(lit(w9((1.0 - m) / (1.0 - u))))
    }.reduce(_ + _)
    p.withColumn("score9", score)
  }
}
