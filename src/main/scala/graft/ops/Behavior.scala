package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over an event log — the product-analytics
  * family beyond funnels ([[Funnel]]): cohort retention, Markov
  * transition matrices, last-touch attribution, rolling z-score
  * anomaly flags, and exact equi-width histograms.
  *
  * All five are shaped for a 100 TB log: per-user state lives behind a
  * user-keyed shuffle (window or aggregation — never a global sort),
  * summaries re-aggregate the keyed partials, and every float the
  * oracle compares is derived from exact integers (epoch micros,
  * value cents) through arithmetic both engines evaluate identically
  * in IEEE doubles.
  */
object Behavior {

  /** Weekly COHORT RETENTION: each user joins the cohort of the ISO
    * week of their first event; for every (cohort week, whole weeks
    * since) we count the distinct users active in that later week.
    *
    * Shape: one user-keyed min-aggregation for first-seen (partial agg
    * does the heavy lift map-side), one user-keyed join back — Catalyst
    * co-partitions it with the aggregation's shuffle — then a distinct
    * + count over (cohort, offset). No broadcast of the cohort frame:
    * it is O(users) and at log scale users don't fit one executor.
    * Week offsets are integer day arithmetic on `date_trunc('week')`
    * (Monday-based in both Spark and DuckDB), so no timezone or float
    * coupling with the oracle.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val ev = events.select(col(userCol).as("u"),
      date_trunc("week", col(tsCol)).cast("date").as("wk"))
    val cohorts = ev.groupBy(col("u")).agg(min(col("wk")).as("cohort_wk"))
    ev.join(cohorts, "u")
      .select(col("u"), col("cohort_wk"),
        floor(datediff(col("wk"), col("cohort_wk")) / 7.0).cast("long")
          .as("week_n"))
      .distinct()
      .groupBy(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
        col("week_n"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_n"))
  }

  /** First-order MARKOV transition matrix over per-user event-type
    * sequences: count each (prev type → next type) adjacency in
    * (ts, id)-lexicographic order and normalize rows to probabilities.
    *
    * Shape: one user-keyed lag window (the only shuffle touching raw
    * events), then a tiny (type × type) aggregation; the row totals
    * come from a window over that already-small matrix, not from a
    * second pass over the log. Probabilities are round(cnt/total, 9) —
    * a bigint ratio both engines compute identically.
    */
  /** RUN-LENGTH ENCODED event sequence per user — the sequence
    * compaction step behavior-modeling pipelines run before feeding
    * clickstreams to a sequence model: consecutive repeats of the
    * same event type collapse to (type, run) tokens ("click×5" is
    * one token, not five), which both shrinks the sequence and makes
    * burst structure explicit. Classic gaps-and-islands: a lag()
    * run-start flag, a running run index, one (user, run) rollup,
    * then an ordered reassembly — two windows + one shuffle over the
    * user key, output rows = users.
    *
    * @return (user, n_events, n_runs, rle) — rle =
    *         "type:len,type:len,…" in event order (ties on ts break
    *         by the id column, so the string is deterministic). */
  def rleSequences(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val runs = events
      .withColumn("_new",
        when(lag(col(typeCol), 1).over(w).isNull ||
          lag(col(typeCol), 1).over(w) =!= col(typeCol), 1L).otherwise(0L))
      .withColumn("_run", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("_run"))
      .agg(max(col(typeCol)).as("_t"), count(lit(1)).as("_len"))
    runs.groupBy(col(userCol))
      .agg(sum(col("_len")).as("n_events"), count(lit(1)).as("n_runs"),
        array_join(transform(
          array_sort(collect_list(struct(col("_run"), col("_t"), col("_len")))),
          e => concat(e.getField("_t"), lit(":"), e.getField("_len"))), ",")
          .as("rle"))
  }

  def markovTransitions(events: DataFrame, userCol: String, typeCol: String,
                        usCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(usCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("next_type"),
        col(usCol), col(idCol))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("cnt"))
    val total = Window.partitionBy(col("prev_type"))
    counts
      .withColumn("p", round(col("cnt").cast("double") /
        sum(col("cnt")).over(total).cast("double"), 9))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** RFM FEATURES — the classic per-entity behavioral feature triple
    * (recency / frequency / monetary) plus quintile scores, the
    * feature-engineering table every churn/LTV model starts from.
    * Exact integers throughout (recency in whole days from the
    * corpus max timestamp — an O(1) driver literal, the TfIdf.idf
    * pattern); quintiles by `ntile(5)` with explicit (metric, user)
    * tie-breaks so both engines deal identical buckets; score 1 =
    * best (most recent / most frequent / highest spend).
    *
    * One per-user aggregate + three windows over the ENTITY table
    * (users ≪ events — feature-table-sized, not log-sized).
    *
    * @return (user, recency_days, frequency, monetary, r_q, f_q,
    *         m_q, rfm). */
  def rfmFeatures(events: DataFrame, userCol: String, usCol: String,
                  centsCol: String): DataFrame = {
    val per = events.groupBy(col(userCol).as("u"))
      .agg(max(col(usCol)).as("last_us"), count(lit(1)).as("frequency"),
        sum(col(centsCol)).as("monetary"))
      .cache()
    val gmax = per.agg(max(col("last_us"))).head().getLong(0)
    val f = per.withColumn("recency_days",
      expr(s"(${gmax}L - last_us) div 86400000000"))
    val rq = ntile(5).over(org.apache.spark.sql.expressions.Window
      .orderBy(col("recency_days"), col("u")))
    val fq = ntile(5).over(org.apache.spark.sql.expressions.Window
      .orderBy(col("frequency").desc, col("u")))
    val mq = ntile(5).over(org.apache.spark.sql.expressions.Window
      .orderBy(col("monetary").desc, col("u")))
    f.select(col("u").as(userCol), col("recency_days"), col("frequency"),
        col("monetary"), rq.cast("long").as("r_q"), fq.cast("long").as("f_q"),
        mq.cast("long").as("m_q"))
      .withColumn("rfm",
        concat(col("r_q"), col("f_q"), col("m_q")))
  }

  /** MARKOV NEXT-EVENT PREDICTION EVAL — train the first-order model
    * ([[markovTransitions]]'s counts) and score it against the same
    * stream's actual transitions (the resubstitution confusion
    * matrix): pred(prev) = argmax_next count(prev→next), ties broken
    * (cnt DESC, next ASC), then every observed transition rolls into
    * one (prev, actual, pred, correct) cell. The accuracy of the
    * argmax row beats any baseline the funnel team eyeballs, and the
    * off-diagonal cells name exactly which transitions the
    * memoryless assumption loses.
    *
    * Shape: one user-keyed lag window (the q154 pass), one count
    * aggregate, a types×types argmax (broadcast-sized), one join
    * back. Exact integers throughout.
    *
    * @return (prev_type, actual_type, pred_type, n, correct) cells. */
  def markovEval(events: DataFrame, userCol: String, typeCol: String,
                 usCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(usCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("next_type"),
        col(usCol), col(idCol))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("cnt"))
    val am = Window.partitionBy(col("prev_type"))
      .orderBy(col("cnt").desc, col("next_type"))
    val model = counts.withColumn("rk", row_number().over(am))
      .filter(col("rk") === 1)
      .select(col("prev_type"), col("next_type").as("pred_type"))
    pairs.join(broadcast(model), Seq("prev_type"))
      .groupBy(col("prev_type"), col("next_type").as("actual_type"),
        col("pred_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("correct",
        when(col("actual_type") === col("pred_type"), 1L).otherwise(0L))
  }

  /** LINEAR MULTI-TOUCH ATTRIBUTION — every touch before a conversion
    * shares the credit equally (the multi-touch counterpart of
    * [[lastTouchAttribution]]): per conversion with k touches, each
    * gets ⌊10⁶/k⌋ parts-per-million, the remainder dealt to the
    * EARLIEST touches (largest-remainder, deterministic) so every
    * conversion distributes exactly 1,000,000 — integer credit sums
    * that reconcile to conversions × 10⁶ on any engine or
    * partitioning.
    *
    * Shape: one per-user touches⋈conversions temporal join (fan-out
    * bounded by touches-per-user × conversions-per-user — what every
    * attribution system pays), one rank window per conversion, one
    * rollup. Conversions with no prior touch drop (the 'direct'
    * bucket is [[lastTouchAttribution]]'s concern).
    *
    * @return (touch_type, n_touches, credit_ppm) per touch type. */
  def linearAttribution(events: DataFrame, userCol: String,
                        typeCol: String, usCol: String, idCol: String,
                        touchTypes: Seq[String],
                        convType: String): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("cu"), col(usCol).as("cus"),
        col(idCol).as("cid"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("tu"), col(typeCol).as("touch_type"),
        col(usCol).as("tus"), col(idCol).as("tid"))
    val joined = touch.join(conv,
      col("tu") === col("cu") && col("tus") < col("cus"))
    val w = Window.partitionBy(col("cu"), col("cid"))
    val ranked = joined
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("tus"), col("tid"))))
      .withColumn("credit",
        (lit(1000000L) / col("k")).cast("long") +
          when(col("rk") <= lit(1000000L) % col("k"), 1L).otherwise(0L))
    ranked.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit")).as("credit_ppm"))
  }

  /** LAST-TOUCH ATTRIBUTION: credit each conversion event to the most
    * recent strictly-earlier touch event (any type in `touchTypes`) by
    * the same user, then roll revenue up per touch type. Conversions
    * with no preceding touch fall into the 'direct' bucket.
    *
    * Shape: a single user-keyed carry-forward window (`last_value`
    * with ignoreNulls over the interleaved event stream) — the
    * sessionization idiom, one shuffle — followed by a tiny per-type
    * rollup. This is the degenerate as-of join where both sides are
    * the same table, so interleave-and-carry beats a self as-of join
    * (one shuffle instead of two, no range bucketing).
    * Revenue stays in exact cents until the final /100.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String, typeCol: String,
                           usCol: String, idCol: String, valueCol: String,
                           touchTypes: Seq[String], convType: String)
      : DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(usCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes: _*), col(typeCol))
    val attributed = events
      .select(col(userCol), col(typeCol), col(usCol), col(idCol),
        round(col(valueCol) * 100).cast("long").as("cents"))
      .withColumn("touch_type",
        last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
    attributed
      .groupBy(coalesce(col("touch_type"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        (sum(col("cents")).cast("double") / 100.0).as("revenue"))
      .orderBy(col("channel"))
  }

  /** ROLLING Z-SCORE anomaly flags: for each event, the z-score of its
    * value against the trailing `window` events of the same user
    * (current row included), flagged when |z| > `zCut`. Rows with
    * fewer than `minN` trailing events emit a null z (not enough
    * evidence ≠ anomalous).
    *
    * Shape: one user-keyed rows-frame window carrying THREE exact
    * integer partials (n, Σcents, Σcents²) — never stddev over raw
    * doubles, so the z both engines derive from those bigints is
    * bit-identical before the final round. One shuffle total.
    */
  def rollingZscore(events: DataFrame, userCol: String, usCol: String,
                    idCol: String, valueCol: String,
                    window: Int = 20, minN: Int = 5, zCut: Double = 3.0)
      : DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(usCol), col(idCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    val cents = round(col(valueCol) * 100).cast("long")
    val withSums = events
      .select(col(userCol), col(usCol), col(idCol), cents.as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("cents")).over(w))
      .withColumn("s2", sum(col("cents") * col("cents")).over(w))
    // var_samp from exact partials: (s2 - s1²/n) / (n-1); z from cents.
    val nd = col("n").cast("double")
    val varS = (col("s2").cast("double") - col("s1").cast("double") *
      col("s1").cast("double") / nd) / (nd - 1.0)
    val z = (col("cents").cast("double") - col("s1").cast("double") / nd) /
      sqrt(varS)
    withSums
      .withColumn("z", when(col("n") >= minN && varS > 0, round(z, 6)))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zCut, lit(false)))
      .select(col(idCol), col(userCol), col("z"), col("is_anomaly"))
      .orderBy(col(idCol))
  }

  /** ROLLING ACTIVE USERS: per day, the exact distinct-user counts for
    * that day (DAU) and the trailing `windowDays` window (WAU), plus
    * the DAU/WAU stickiness ratio. The standard engagement panel.
    *
    * Shape: ONE distinct over (day, user) is the only pass at event
    * volume; the rolling window is the explode-forward trick — each
    * (day, user) row votes for the `windowDays` target days it falls
    * inside — so WAU is a plain count-distinct with bounded ×W
    * amplification of the ALREADY-DEDUPED daily frame, not a
    * sliding-window distinct over raw events (which no engine does
    * exactly without this rewrite; sketches are the q65 path when ×W
    * is too much). Partial windows at the range edges count what they
    * see, full stop.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val du = events
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("u"))
      .distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val span = du.agg(max(col("day")).as("d1"))
    val wau = du
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("off"),
        col("day"), col("u"))
      .select(date_add(col("day"), col("off")).as("day"), col("u"))
      .crossJoin(span)
      .filter(col("day") <= col("d1"))
      .groupBy(col("day"))
      .agg(countDistinct(col("u")).as("wau"))
    dau.join(wau, "day")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 9)
          .as("stickiness"))
      .orderBy(col("day"))
  }

  /** Gaps-and-islands sessionization (one user-keyed window): adds
    * `sid` (1-based per user) and renames the type column to `item`.
    * Shared by [[associationRules]] and [[sessionPatternMatch]]. */
  private def sessionized(events: DataFrame, userCol: String,
                          typeCol: String, usCol: String, idCol: String,
                          gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(usCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(userCol), col(typeCol).as("item"), col(usCol), col(idCol))
      .withColumn("new_s",
        when(lag(col(usCol), 1).over(w).isNull ||
          col(usCol) - lag(col(usCol), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(run))
  }

  /** CEP-style SEQUENCE PATTERN MATCH (MATCH_RECOGNIZE-lite): render
    * each 30-min session as its ordered event-type string
    * ("view>click>purchase>…") and test a regex over it — the pattern
    * language every complex-event-processing engine compiles to.
    * Keep patterns inside the RE2 ∩ java.util.regex subset (no
    * lookaround) so any engine replays them.
    *
    * Shape: the sessionize window plus ONE session-keyed aggregation;
    * the collect_list is bounded by session length (the q62
    * pack-sequences boundedness argument — a session is a human-scale
    * artifact, not a data-scale one; a runaway key would hit the same
    * wall in any sessionizer). Matching is a narrow codegen rlike.
    */
  def sessionPatternMatch(events: DataFrame, userCol: String,
                          typeCol: String, usCol: String, idCol: String,
                          pattern: String,
                          gapUs: Long = 1800L * 1000000L): DataFrame =
    sessionized(events, userCol, typeCol, usCol, idCol, gapUs)
      .groupBy(col(userCol), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(usCol), col(idCol),
              col("item")))),
            x => x.getField("item")), ">").as("seq"))
      .withColumn("matched", col("seq").rlike(pattern))
      .orderBy(col(userCol), col("sid"))

  /** Market-basket ASSOCIATION RULES over session baskets: sessionize
    * (30-min-gap gaps-and-islands), treat each session's distinct
    * event types as a basket, and emit every directed rule x→y with
    * its support n_xy/n_sessions, confidence n_xy/n_x, and lift
    * conf/(n_y/n_sessions) — the Apriori output for pair rules,
    * computed exactly (no candidate pruning needed at itemset size 2).
    *
    * Shape: the sessionize window is the only pass over raw events;
    * baskets come from a map-side-partial distinct on (user, sid,
    * item); the pair self-join is keyed on the SESSION (its fan-out is
    * bounded by the item vocabulary, not the event count), and every
    * count table after that is O(|item vocab|²). Ratios are bigint
    * products evaluated exactly in doubles, round 9.
    */
  def associationRules(events: DataFrame, userCol: String, typeCol: String,
                       usCol: String, idCol: String,
                       gapUs: Long = 1800L * 1000000L): DataFrame = {
    val baskets = sessionized(events, userCol, typeCol, usCol, idCol, gapUs)
      .select(col(userCol), col("sid"), col("item"))
      .distinct()
    val nSess = baskets
      .agg(countDistinct(struct(col(userCol), col("sid"))).as("n_sessions"))
    val ni = baskets.groupBy(col("item")).agg(count(lit(1)).as("n_i"))
    val pairs = baskets.alias("a")
      .join(baskets.alias("b"),
        col(s"a.$userCol") === col(s"b.$userCol") &&
          col("a.sid") === col("b.sid") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("x"), col("b.item").as("y"))
      .agg(count(lit(1)).as("n_xy"))
    val directed = pairs.select(col("x"), col("y"), col("n_xy"))
      .union(pairs.select(col("y"), col("x"), col("n_xy")))
    directed
      .join(ni.select(col("item").as("x"), col("n_i").as("n_x")), "x")
      .join(ni.select(col("item").as("y"), col("n_i").as("n_y")), "y")
      .crossJoin(nSess)
      .select(col("x").as("antecedent"), col("y").as("consequent"),
        col("n_xy"),
        round(col("n_xy").cast("double") / col("n_sessions").cast("double"), 9)
          .as("support"),
        round(col("n_xy").cast("double") / col("n_x").cast("double"), 9)
          .as("confidence"),
        round((col("n_xy") * col("n_sessions")).cast("double") /
          (col("n_x") * col("n_y")).cast("double"), 9).as("lift"))
      .orderBy(col("antecedent"), col("consequent"))
  }

  /** Exact EQUI-WIDTH HISTOGRAM of a value column in `nBins` bins over
    * the observed [min, max]. Bin edges and assignment are all-integer
    * (cents): bin = floor((c − min)·nBins / (max − min + 1)) — the
    * numerator stays exact in a double far below 2^53, `floor` means
    * no engine-specific cast-rounding (DuckDB rounds double→bigint,
    * Spark truncates), and the +1 keeps the max value inside the last
    * bin without a special case.
    *
    * Shape: one exact min/max aggregate (a 1-row frame, broadcast by
    * Catalyst into the scan's projection via cross join), then one
    * groupBy(bin) — two passes over the column, zero wide shuffles.
    * This is the exact complement of the approx-percentile sketch
    * family (q104): histograms you can afford exactly, quantiles you
    * sketch.
    */
  def valueHistogram(events: DataFrame, valueCol: String, nBins: Int = 10)
      : DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val bounds = events.agg(min(cents).as("lo"), max(cents).as("hi"))
    val span: Column = col("hi") - col("lo") + 1L
    events.select(cents.as("c"))
      .crossJoin(bounds)
      .groupBy(floor(((col("c") - col("lo")) * nBins) / span).cast("long")
          .as("bin"),
        col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (col("lo") + floor(col("bin") * span / nBins)).cast("long")
          .as("lo_cents"),
        col("n"))
      .orderBy(col("bin"))
  }

  /** KAPLAN–MEIER survival curve per cohort (Kaplan & Meier 1958) —
    * the censoring-aware retention estimator [[cohortRetention]]'s
    * raw counts can't give: subjects still alive at the observation
    * boundary are CENSORED, not churned, and the product-limit
    * estimator S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) is the textbook-correct
    * way to count them.
    *
    * Determinism discipline: the curve is computed on the COMPRESSED
    * per-(group, duration) table (one partial-agg shuffle from N
    * subjects to ≤ distinct-duration rows per cohort); risk sets come
    * from keyed running sums over that table; each factor's
    * ln((n−d)/n) is round-9-scaled once and the log-survival is an
    * exact long prefix sum (the entropy/q146 discipline), so the
    * whole curve replays bit-for-bit — `surv9` is the one
    * presentation exp at the end. A step where every remaining
    * subject exits (d = n) drives S to exactly 0 from that point on
    * (flagged, not ln(0)).
    *
    * @param durCol      integral duration per subject (one ROW per
    *                    subject).
    * @param observedCol true = the terminal event was observed;
    *                    false = censored at `durCol`.
    * @return per (group, t): (group, t, n_risk, d_events, c_censored,
    *         ln_surv9, surv9) — survival AFTER time t, all duration
    *         rows emitted (censoring-only rows keep the curve flat). */
  def kaplanMeier(df: DataFrame, groupCol: String, durCol: String,
                  observedCol: String): DataFrame = {
    val per = df.select(col(groupCol).as("g"), col(durCol).cast("long").as("t"),
        col(observedCol).cast("boolean").as("ev"))
      .groupBy(col("g"), col("t"))
      .agg(sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
        sum(when(col("ev"), 0L).otherwise(1L)).as("c"))
    val wAsc = Window.partitionBy(col("g")).orderBy(col("t"))
    val run = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("n_total",
        sum(col("d") + col("c")).over(Window.partitionBy(col("g"))))
      .withColumn("exited_thru", sum(col("d") + col("c")).over(run))
      .withColumn("n_risk",
        col("n_total") - col("exited_thru") + col("d") + col("c"))
      .withColumn("ln_f9", when(col("d") > 0L && col("d") < col("n_risk"),
          graft.util.Exact.scaled(round(log(
            (col("n_risk") - col("d")).cast("double") /
              col("n_risk").cast("double")), 9), 9))
        .otherwise(lit(0L)))
      .withColumn("ln_surv9", sum(col("ln_f9")).over(run))
      .withColumn("dead",
        max(when(col("d") === col("n_risk"), 1L).otherwise(0L)).over(run))
      .select(col("g"), col("t"), col("n_risk"), col("d").as("d_events"),
        col("c").as("c_censored"), col("ln_surv9"),
        when(col("dead") === 1L, lit(0.0))
          .otherwise(round(exp(col("ln_surv9").cast("double") / 1e9), 9))
          .as("surv9"))
      .orderBy(col("g"), col("t"))
  }
}
