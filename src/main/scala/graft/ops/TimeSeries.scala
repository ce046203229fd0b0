package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream
  * onto a fixed grid with last-observation-carried-forward fill —
  * the transform every metrics/feature pipeline runs before
  * windowed/ML consumption (irregular ticks → hourly panel).
  *
  * Spark-first shape: the per-key grid is `sequence(min, max, step)`
  * exploded (amplification = span/step per key, no driver state), and
  * the LOCF fill is exactly an as-of join of grid points against
  * observations — one shuffle on the key via [[AsOfJoin.asOf]]'s
  * union+window plan. At 100 TB this scales as far as any windowed
  * aggregation does; no per-key collect, no UDFs.
  */
object TimeSeries {

  /** HOLT LINEAR (double) EXPONENTIAL SMOOTHING + h-step FORECAST —
    * the capacity-planning recurrence (Holt 1957; the trend-aware
    * sibling of [[ewmaBounded]]'s level-only EWMA): per key over its
    * observed-day count series,
    *   l_t = (y_t·S + 3·(l_{t−1}+b_{t−1})) / 4        (α = 1/4)
    *   b_t = ((l_t − l_{t−1}) + 4·b_{t−1}) / 5        (β = 1/5)
    * with S = 10⁶ scaling and TRUNCATING long division (Java `/` and
    * DuckDB `//` agree on truncation toward zero, so the recurrence
    * replays bit-for-bit — the rational-coefficient pinning that makes
    * an inherently sequential float recurrence oracle-checkable).
    * Also reports the one-step-ahead backtest Σ|y_t·S −
    * (l_{t−1}+b_{t−1})| and the h ∈ {1,2,3} linear forecasts
    * l_T + h·b_T.
    *
    * Scale shape: one partial-agg shuffle to (key, day) counts, then
    * ONE mapGroups per key — the recurrence is inherently sequential
    * in t but embarrassingly parallel across keys, and the per-key
    * state is two longs (the panel rows stream through sorted). At
    * 100 TB the key cardinality carries the parallelism, exactly how
    * production forecasting jobs shard.
    *
    * @return (key, n_days, level6, trend6, forecast_1, forecast_2,
    *          forecast_3, sae6) — the *6 columns are S-scaled longs. */
  def holtSmooth(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val S = 1000000L
    df.groupBy(col(keyCol).as("k"), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("k"), col("day"), col("y"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val ys = it.toArray.sortBy(_._2.getTime).map(_._3)
        var l = ys(0) * S
        var b = 0L
        var sae = 0L
        var t = 1
        while (t < ys.length) {
          val pred = l + b
          sae += math.abs(ys(t) * S - pred)
          val lNew = (ys(t) * S + 3L * pred) / 4L
          b = ((lNew - l) + 4L * b) / 5L
          l = lNew
          t += 1
        }
        (k, ys.length.toLong, l, b, l + b, l + 2 * b, l + 3 * b, sae)
      }
      .toDF(keyCol, "n_days", "level6", "trend6", "forecast_1",
        "forecast_2", "forecast_3", "sae6")
  }

  /** HOLT–WINTERS ADDITIVE SEASONAL smoothing + h-step FORECAST
    * (Winters 1960; the seasonality-aware member of the
    * [[ewmaBounded]] → [[holtSmooth]] family): per key over its
    * observed-day count series with a weekly (`period` = 7) additive
    * seasonal state,
    *   idx  = epochDay(day_t) mod period   (CALENDAR-anchored: a
    *          missing day must not rotate every later observation
    *          into the wrong seasonal slot, as a row-index t mod 7
    *          would — Thursday's count updating Wednesday's state
    *          for the rest of the series)
    *   l_t  = (y_t·S − s[idx] + 3·(l_{t−1}+b_{t−1})) / 4   (α = 1/4)
    *   b_t  = ((l_t − l_{t−1}) + 4·b_{t−1}) / 5            (β = 1/5)
    *   s[idx] ← ((y_t·S − l_t) + 2·s[idx]) / 3             (γ = 1/3)
    * seeded l_0 = y_0·S, b_0 = 0, s ≡ 0 (the zero-initialized
    * seasonal vector LEARNS the weekly shape as rounds pass — no
    * first-season special case to replay). All state is S = 10⁶
    * scaled longs with TRUNCATING division — Java `/` and DuckDB `//`
    * both truncate toward zero (negatives included, which seasonal
    * deviations produce), so the recurrence replays bit-for-bit.
    * Also reports the one-step-ahead backtest Σ|y_t·S − (l+b+s[idx])|
    * and forecasts ŷ_{T+h} = l_T + h·b_T +
    * s[(epochDay(day_T) + h) mod period].
    *
    * Scale shape: identical to [[holtSmooth]] — one partial-agg
    * shuffle to (key, day) counts, one mapGroups per key; per-key
    * state is `period`+2 longs. Sequential in t, embarrassingly
    * parallel across keys.
    *
    * @return (key, n_days, level6, trend6, s0..s{period−1},
    *          forecast_1..3, sae6). */
  def holtWinters(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val period = 7 // weekly seasonality over daily counts (pinned)
    val spark = df.sparkSession
    import spark.implicits._
    val S = 1000000L
    df.groupBy(col(keyCol).as("k"), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("k"), col("day"), col("y"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2.getTime)
        // date_trunc('day') in the UTC session ⇒ epoch ms divide evenly
        val eds = rows.map(_._2.getTime / 86400000L)
        val ys = rows.map(_._3)
        val s = new Array[Long](period)
        var l = ys(0) * S
        var b = 0L
        var sae = 0L
        var t = 1
        while (t < ys.length) {
          val idx = (eds(t) % period).toInt
          val pred = l + b + s(idx)
          sae += math.abs(ys(t) * S - pred)
          val lNew = (ys(t) * S - s(idx) + 3L * (l + b)) / 4L
          b = ((lNew - l) + 4L * b) / 5L
          s(idx) = ((ys(t) * S - lNew) + 2L * s(idx)) / 3L
          l = lNew
          t += 1
        }
        val lastEd = eds(ys.length - 1)
        def fc(h: Int): Long = l + h * b + s(((lastEd + h) % period).toInt)
        (k, ys.length.toLong, l, b, s(0), s(1), s(2), s(3), s(4), s(5),
          s(6), fc(1), fc(2), fc(3), sae)
      }
      .toDF(keyCol, "n_days", "level6", "trend6", "s0", "s1", "s2", "s3",
        "s4", "s5", "s6", "forecast_1", "forecast_2", "forecast_3", "sae6")
  }

  /** Hourly LOCF panel: for each key, one row per hour from its first
    * to its last observation, carrying the latest value at-or-before
    * the grid instant (null before the first in-hour observation).
    * Ties at identical (key, ts) are pre-reduced deterministically to
    * the value of the max `tieCol` (as-of ordering among equal
    * timestamps is otherwise unspecified).
    *
    * SPAN CONTRACT (`maxSpanHours`): output size is Σ_keys span/step —
    * it grows with the KEY TIME SPAN, not the input row count, so one
    * key with a decades-long first→last gap silently explodes the
    * panel (a 30-year sensor = 263k grid rows from 2 observations).
    * The per-key span is therefore CHECKED against `maxSpanHours`
    * inside the grid expression (narrow, no extra pass) and the
    * operator fails loudly instead of fanning out — resample a
    * violating corpus in windows, or raise the cap deliberately. This
    * also documents why the 100× scale probe reads superlinear wall
    * for q80: a time-extended replica grows every key's span, so the
    * OUTPUT grows superlinearly by design; runtime per emitted grid
    * row is the honest scale metric (ScaleProbe's n_rows
    * normalization).
    *
    * BREAKING-DEFAULT NOTE (r10, deliberate): the cap default is
    * ~3 years, so a previously-working multi-decade key now raises at
    * runtime — that loud failure IS the contract (the silent
    * alternative is a 263k-row fan-out per stray key). Callers who
    * genuinely want unbounded spans pass
    * `maxSpanHours = Long.MaxValue` and own the output size.
    *
    * Output: key, `hour` (timestamp, grid instant), `value`. */
  def resampleHourlyLocf(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, tieCol: String,
                         maxSpanHours: Long = 26304L): DataFrame = {
    // every internal frame is built from explicit selects, so other
    // input columns never leak in — only the KEY column's name can
    // collide with the constructed output/internal names (tsCol/
    // valCol/tieCol are aliased away immediately)
    val reserved = Set("hour", "value", "_ots", "_oval", "_h0", "_h1",
      "_ts", "_side", "_lrow", "_p", "_asof", "locf__oval")
    require(!reserved.contains(keyCol),
      s"keyCol '$keyCol' collides with a reserved output/internal name")
    val obs = df.groupBy(col(keyCol), col(tsCol).as("_ots"))
      .agg(max_by(col(valCol), col(tieCol)).as("_oval"))
    val spanHours = (unix_seconds(col("_h1")) - unix_seconds(col("_h0")))
      .divide(lit(3600L)).cast("long")
    val grid = df.groupBy(col(keyCol))
      .agg(date_trunc("hour", min(col(tsCol))).as("_h0"),
        date_trunc("hour", max(col(tsCol))).as("_h1"))
      .select(col(keyCol),
        explode(when(spanHours > maxSpanHours, raise_error(concat(
            lit(s"resampleHourlyLocf: key "), col(keyCol).cast("string"),
            lit(s" spans more hours than maxSpanHours=$maxSpanHours — " +
              "resample in windows or raise the cap deliberately"))))
          .otherwise(sequence(col("_h0"), col("_h1"),
            expr("interval 1 hour")))).as("hour"))
    AsOfJoin.asOf(grid, obs, Seq(keyCol), "hour", "_ots", Seq("_oval"),
        prefix = "locf_")
      .select(col(keyCol), col("hour"), col("locf__oval").as("value"))
  }

  /** Hourly LINEAR-INTERPOLATION panel — the lerp sibling of
    * [[resampleHourlyLocf]] (LOCF holds the last value; interpolation
    * is the correct regularization for continuous signals — sensor
    * readings, balances, rates). For each key and each hourly grid
    * instant t in its span:
    *   v(t) = (v0·(t1−t) + v1·(t−t0)) div (t1−t0)
    * over the surrounding observations (t0 ≤ t < t1), computed in
    * EXACT integer math — values as cents, instants as micros,
    * truncating division (Java `/` ≡ DuckDB `//`) — so the panel
    * replays bit-for-bit. An observation exactly at t yields its own
    * value (the formula collapses to v0); instants before the first
    * observation are null; an instant at the LAST observation with
    * nothing after takes that value.
    *
    * Plan: observations and grid instants UNION into one per-key
    * stream; `prev` is a running last(ignoreNulls) over the (us, side
    * — observations first at equal instants) ASC order and `next` the
    * same RUNNING shape over the DESC order with a strict frame — one
    * exchange, two in-partition sorts, both windows O(n). (A
    * first(ignoreNulls) over (1, unboundedFollowing) would express
    * `next` in one sort but Spark re-aggregates that frame from each
    * row to the partition end — O(rows²) per key.) No range join, no
    * per-key collect.
    *
    * @return (key, hr_us — grid instant epoch micros, v_interp_c —
    *         interpolated cents, null outside coverage). */
  def resampleHourlyLerp(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, tieCol: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    val obs = df.groupBy(col(keyCol), us.as("us"))
      .agg(max_by(round(col(valCol) * 100).cast("long"), col(tieCol))
        .as("vc"))
      .select(col(keyCol), col("us"), lit(0).as("side"),
        col("vc").as("_ov"), col("us").as("_ot"))
    val grid = df.groupBy(col(keyCol))
      .agg(date_trunc("hour", min(col(tsCol))).as("_h0"),
        date_trunc("hour", max(col(tsCol))).as("_h1"))
      .select(col(keyCol),
        explode(sequence(col("_h0"), col("_h1"),
          expr("interval 1 hour"))).as("_hour"))
      .select(col(keyCol), unix_micros(col("_hour")).as("us"),
        lit(1).as("side"), lit(null).cast("long").as("_ov"),
        lit(null).cast("long").as("_ot"))
    val W = org.apache.spark.sql.expressions.Window
    // prev = running last over the ASC order. next = the SAME running
    // shape over the DESC order — NOT first() over a
    // (1, unboundedFollowing) frame: Spark's UnboundedFollowing frame
    // re-aggregates from each row to the partition end, O(rows²) per
    // key (measured 11 s at sf0.1 vs ~2 s for the two running frames).
    // DESC tie order (us DESC, side DESC) puts the grid row BEFORE its
    // same-instant observation, so "strictly after in event time"
    // is exactly the strict preceding frame.
    val prevW = W.partitionBy(col(keyCol)).orderBy(col("us"), col("side"))
      .rowsBetween(W.unboundedPreceding, 0)
    val nextW = W.partitionBy(col(keyCol))
      .orderBy(col("us").desc, col("side").desc)
      .rowsBetween(W.unboundedPreceding, -1)
    obs.unionAll(grid)
      .withColumn("_pv", last(col("_ov"), ignoreNulls = true).over(prevW))
      .withColumn("_pt", last(col("_ot"), ignoreNulls = true).over(prevW))
      .withColumn("_nv", last(col("_ov"), ignoreNulls = true).over(nextW))
      .withColumn("_nt", last(col("_ot"), ignoreNulls = true).over(nextW))
      .where(col("side") === 1)
      // cents × micros products overflow a Long once values ~2e7 meet
      // month-long gaps — accumulate the numerator in decimal(38,0)
      // (HUGEINT on the oracle side); div still returns a long
      .withColumn("_num",
        col("_pv").cast("decimal(38,0)") * (col("_nt") - col("us")) +
          col("_nv").cast("decimal(38,0)") * (col("us") - col("_pt")))
      .withColumn("_den", col("_nt") - col("_pt"))
      .select(col(keyCol), col("us").as("hr_us"),
        when(col("_pt").isNull, lit(null).cast("long"))
          .when(col("_nt").isNull,
            when(col("_pt") === col("us"), col("_pv"))
              .otherwise(lit(null).cast("long")))
          .otherwise(expr("_num div _den"))
          .as("v_interp_c"))
  }

  /** SCD TYPE-2 HISTORY build: collapse a per-key change log into
    * validity intervals — one row per state RUN, `[valid_from_us,
    * valid_to_us)` half-open, `valid_to_us` null on the current row.
    * Consecutive events with an unchanged state extend the run
    * (classic warehouse dimension-history semantics); ordering within
    * a key is lexicographic (us, id) so equal-timestamp changes
    * replay deterministically.
    *
    * Shape: two window passes over the SAME user-keyed sort — Catalyst
    * plans one exchange + one sort, the second window reuses both; no
    * self-join, no sessionize-style running sum. The change filter
    * drops unchanged rows before the `lead`, so the second pass runs
    * over the (usually far smaller) run-boundary set.
    */
  def scd2History(df: DataFrame, keyCol: String, stateCol: String,
                  usCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(usCol), col(idCol))
    val changes = df
      .select(col(keyCol), col(stateCol), col(usCol), col(idCol))
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(stateCol))
    changes
      .withColumn("valid_to_us", lead(col(usCol), 1).over(w))
      .select(col(keyCol), col(stateCol),
        col(usCol).as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** TIME-WEIGHTED average (TWAP): each observation weighted by how
    * long it was the current value — the correct mean for irregular
    * series (a price held for an hour counts 60× one held a minute;
    * the plain mean q01-style aggregates compute is the per-EVENT
    * mean). The metrics/finance standard.
    *
    * Exact: value (integral units) × interval (micros) products
    * accumulate as DECIMAL(38,0) — a day-long gap alone (8.6e10 µs)
    * puts one product past 2^53 — and the denominator is the exact
    * span Σ gaps. One per-key lead window (state bounded by key
    * history) + one mergeable agg; keys with a single observation
    * span zero time and emit no row (same on both engines).
    *
    * @return (key, n_intervals, den_us, num [decimal string],
    *         twap6 — num/den rescaled by `unitDiv`, round-6). */
  def twap(df: DataFrame, keyCol: String, usCol: String, valCol: String,
           tieCol: String, unitDiv: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(usCol), col(tieCol))
    val gaps = df
      .withColumn("_gap", lead(col(usCol), 1).over(w) - col(usCol))
      .filter(col("_gap").isNotNull)
    gaps.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("_gap")).as("den_us"),
        sum((col(valCol).cast("decimal(19,0)") *
          col("_gap").cast("decimal(19,0)")).cast("decimal(38,0)")).as("num"))
      .select(col(keyCol), col("n_intervals"), col("den_us"),
        col("num").cast("string").as("num"),
        round(col("num").cast("double") / col("den_us").cast("double")
          / unitDiv, 6).as("twap6"))
      .orderBy(col(keyCol))
  }

  /** Bounded exponential smoothing (EWMA, α = ½) in EXACT integer
    * arithmetic — the trend-smoothing transform for metric panels,
    * made cross-engine checkable by two choices:
    *   - α = ½ makes every weight a power of two, so the weighted sum
    *     is an exact integer (`Σ x_{t−j}·2^(W−1−j)`) — no float
    *     accumulation anywhere;
    *   - the window is BOUNDED at `w` rows, which both caps the
    *     weight range (truncated-EWMA ≡ full EWMA to < 2^−w relative)
    *     and keeps the per-row state O(w) — the unbounded recurrence
    *     y_t = αx + (1−α)y_{t−1} is a serial scan per key; the bounded
    *     form is a plain frame window, embarrassingly parallel across
    *     keys.
    *
    * The smoothed value = num/den with den = 2^w − 2^(w−m)
    * (m = rows available, so the leading edge is a properly
    * re-normalized partial window, not a zero-padded one).
    *
    * @param orderCols total per-key order (ties must be broken —
    *                  pass (ts, id)).
    * @return input + `ewma_num` (exact long) + `ewma_den` (exact
    *         long); callers derive the double at their unit scale. */
  def ewmaBounded(df: DataFrame, keyCol: String, orderCols: Seq[String],
                  valCol: String, w: Int = 20): DataFrame = {
    require(w >= 1 && w <= 62, "integer weights need w in [1, 62]")
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(w - 1), 0)
    df.withColumn("_xs", collect_list(col(valCol).cast("long")).over(win))
      .withColumn("_m", size(col("_xs")))
      .withColumn("ewma_num", expr(
        s"aggregate(zip_with(_xs, sequence(1, _m), " +
          s"(x, i) -> x * shiftleft(1L, ${w - 1} - _m + i)), 0L, " +
          "(acc, v) -> acc + v)"))
      .withColumn("ewma_den",
        expr(s"shiftleft(1L, $w) - shiftleft(1L, $w - _m)"))
      .drop("_xs", "_m")
  }

  /** INTERVAL-UNION coverage (the gaps-and-islands merge): collapse a
    * per-key set of possibly-overlapping half-open intervals
    * [start, end) into their maximal disjoint islands — the classic
    * warehouse kernel behind "total time under incident", machine
    * utilization, and validity-window consolidation, and the interval
    * complement of [[scd2History]] (which builds intervals; this
    * merges them).
    *
    * All integer arithmetic: one keyed window computes the running
    * max of `end` over strictly-preceding rows under the total
    * (start, end, tie) order; a row opens a new island iff its start
    * exceeds that max; the island id is a running sum of the open
    * flags; one keyed agg merges each island. Two keyed window passes
    * + one partial agg — no self-join, no explode; at 100 TB this is
    * the only shape that works (the naive point-in-any-interval
    * rewrite is quadratic).
    *
    * @return (key, island, start, end, n_merged) — islands numbered
    *         1.. in start order per key. */
  def intervalCoverage(df: DataFrame, keyCol: String, startCol: String,
                       endCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col("g"))
      .orderBy(col("s"), col("e"), col("t"))
    val base = df.select(col(keyCol).as("g"), col(startCol).cast("long").as("s"),
      col(endCol).cast("long").as("e"), col(tieCol).as("t"))
    base
      .withColumn("prev_max_e",
        max(col("e")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("opens",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("opens")).over(ord))
      .groupBy(col("g").as(keyCol), col("island"))
      .agg(min(col("s")).as("start"), max(col("e")).as("end"),
        count(lit(1)).as("n_merged"))
      .orderBy(col(keyCol), col("island"))
  }

  /** CUSUM change-point statistic per key — where does a series most
    * look like it switched regimes? For prefix sums S_i of the first
    * i values (under the total (orderCols) order) and total S over n
    * rows, the cut statistic is D_i = |n·S_i − i·S| — the
    * cross-multiplied form of |S_i/i − S/n| ·(i·n), all EXACT long
    * arithmetic with no division anywhere — maximized over
    * i ∈ [1, n−1], earliest i on ties. The batch change-point monitor
    * beside [[graft.ops.CorpusStats]]' KS (two known slices) — here
    * the cut itself is unknown and searched.
    *
    * One keyed window pass for prefix sums + one argmax agg via
    * lexicographic `max(struct)`; mergeable partials end to end.
    *
    * @return (key, n, cut_idx, dmax, s_left, s_total): dmax exact,
    *         `s_left` the prefix sum at the best cut. */
  def cusumChangePoint(df: DataFrame, keyCol: String,
                       orderCols: Seq[String], valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pre = df
      .withColumn("_i", row_number().over(w).cast("long"))
      .withColumn("_si", sum(col(valCol).cast("long")).over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("_s", sum(col(valCol).cast("long"))
        .over(Window.partitionBy(col(keyCol))))
    pre.filter(col("_i") < col("_n"))
      .withColumn("_d", abs(col("_n") * col("_si") - col("_i") * col("_s")))
      .groupBy(col(keyCol))
      .agg(max(col("_n")).cast("long").as("n"),
        max(struct(col("_d").as("d"), (-col("_i")).as("negi"),
          col("_si").as("si"), col("_s").as("s"))).as("_m"))
      .select(col(keyCol), col("n"), (-col("_m.negi")).as("cut_idx"),
        col("_m.d").as("dmax"), col("_m.si").as("s_left"),
        col("_m.s").as("s_total"))
      .orderBy(col(keyCol))
  }

  /** M4 time-series downsampling (Jugel et al. 2014, VLDB "M4: A
    * Visualization-Oriented Time Series Data Aggregation") — per
    * (key, time bucket), keep exactly the four points a pixel column
    * can show: first, last, min, max. M4 is the downsampler with a
    * PROOF: rendering the 4·width retained points draws the same
    * pixels as rendering everything, so it's the canonical
    * 100 TB → dashboard reduction.
    *
    * All four retained values are exact integer aggregates — min/max
    * of the value directly, first/last as `min/max(struct(us, tie,
    * v))` whose lexicographic ordering makes the (us, tie) tie-break
    * explicit — so the whole reduction is ONE mergeable partial agg
    * per (key, bucket): map-side combine does the work and the
    * shuffle carries a handful of scalars per bucket regardless of
    * input size. No window, no sort.
    *
    * @param valCol integral (pre-scaled) value column.
    * @param bucketUs bucket width in microseconds.
    * @return (key, bucket, n, first_val, last_val, min_val, max_val,
    *         min_us, max_us) — bucket = floor(us / bucketUs). */
  /** AUTOCORRELATION FUNCTION of the hourly event-count series per
    * key, lags 1..`maxLag` — the periodicity detector that justifies
    * (or refutes) a seasonal model: a daily cycle shows as a peak at
    * lag 24, weekly at 168 (complements [[cusumChangePoint]]'s level
    * shifts and the hour-of-day seasonal decomposition).
    *
    * Exactness: on the zero-filled hourly grid, the centered series
    * is taken at ×n scale — y_t = n·c_t − Σc, an exact long — so
    * numerator Σ y_t·y_{t−ℓ} and denominator Σ y_t² are exact
    * integer moments (decimal(38,0) ↔ HUGEINT; the common n² factor
    * cancels in the ratio). One fixed double division + round-9.
    *
    * Scale: the raw table collapses to (key, hour) counts in one
    * shuffle; everything after runs on the grid (hours×keys —
    * thousands of rows per key-year, regardless of event volume).
    * The lag join is an equi join on (key, hr−ℓ) over that small
    * grid; `maxLag` multiplies grid rows, not raw rows.
    *
    * @return (key, lag, n, npairs, acf9) — n = grid length, npairs =
    *         n−lag overlapping pairs; acf9 NULL for a zero-variance
    *         series. */
  def acf(df: DataFrame, keyCol: String, tsCol: String,
          maxLag: Int = 24): DataFrame = {
    require(maxLag >= 1, "maxLag must be positive")
    val d38 = "decimal(38,0)"
    val counts = df.select(col(keyCol).as("k"),
        expr(s"unix_micros(`$tsCol`) div 3600000000").as("hr"))
      .groupBy(col("k"), col("hr")).agg(count(lit(1)).as("c"))
    val bounds = counts.groupBy(col("k"))
      .agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
    val grid = bounds
      .select(col("k"), explode(sequence(col("mn"), col("mx"))).as("hr"))
      .join(counts, Seq("k", "hr"), "left")
      .select(col("k"), col("hr"), coalesce(col("c"), lit(0L)).as("c"))
      .cache()
    val stats = grid.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
    val y = grid.join(broadcast(stats), Seq("k"))
      .select(col("k"), col("hr"), col("n"),
        (col("n") * col("c") - col("s")).as("y"))
    val den = y.groupBy(col("k"))
      .agg(sum(col("y").cast(d38) * col("y").cast(d38)).as("den"))
    val lags = df.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag"))
    val shifted = y.select(col("k").as("k2"), col("hr").as("hr2"),
      col("y").as("y2"))
    val num = y.crossJoin(broadcast(lags))
      .join(shifted,
        col("k") === col("k2") && col("hr2") === col("hr") - col("lag"))
      .groupBy(col("k"), col("lag"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("npairs"),
        sum(col("y").cast(d38) * col("y2").cast(d38)).as("num"))
    num.join(broadcast(den), Seq("k"))
      .select(col("k").as(keyCol), col("lag"), col("n"), col("npairs"),
        when(col("den") === 0, lit(null))
          .otherwise(round(col("num").cast("double") /
            col("den").cast("double"), 9)).as("acf9"))
  }

  def m4Downsample(df: DataFrame, keyCol: String, usCol: String,
                   tieCol: String, valCol: String,
                   bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucket width must be positive")
    val v = col(valCol).cast("long")
    val pos = struct(col(usCol), col(tieCol), v.as("v"))
    df.groupBy(col(keyCol),
        expr(s"`$usCol` div ${bucketUs}L").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(pos).getField("v").as("first_val"),
        max(pos).getField("v").as("last_val"),
        min(v).as("min_val"), max(v).as("max_val"),
        min(col(usCol)).as("min_us"), max(col(usCol)).as("max_us"))
      .orderBy(col(keyCol), col("bucket"))
  }
}
