package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact ML evaluation / training primitives over integer features —
  * the model-adjacent aggregates a data-curation cluster runs beside
  * the pipeline: ranking quality (AUC) of a scoring signal against
  * labels, and the information-gain decision stump that turns a
  * quality score into a calibrated threshold.
  *
  * Both are EXACT under the engine's determinism discipline: AUC from
  * integer rank sums in doubled units (tie-averaging stays integral),
  * entropies as Σ c·ln9 scaled-long sums (the q146 tokenEntropy form)
  * — so both replay bit-for-bit on any engine.
  */
object MlEval {

  /** Exact AUC (Mann–Whitney U) of an integer score against a boolean
    * label: P(score⁺ > score⁻) + ½·P(tie). Computed from per-score
    * counts — `num2 = Σ_s n⁺(s)·(2·cumn⁻(<s) + n⁻(s))` in doubled
    * units so tie-averaging stays integral — then one final division.
    *
    * Scale shape: ONE groupBy(score) shuffle compresses N rows to the
    * distinct-score table; the prefix sum over that table runs as the
    * canonical two-pass distributed scan (range-sort by score,
    * per-partition totals — an O(partitions) driver array, not data —
    * then a per-partition running fold). No global single-partition
    * window anywhere.
    *
    * @return one row: (n_pos, n_neg, num2, auc). */
  def aucExact(df: DataFrame, scoreCol: String, posCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val g = df.select(col(scoreCol).cast("long").as("s"),
        col(posCol).cast("boolean").as("p"))
      .groupBy(col("s"))
      .agg(sum(when(col("p"), 1L).otherwise(0L)).as("np"),
        sum(when(col("p"), 0L).otherwise(1L)).as("nn"))
      .orderBy(col("s"))
    val rdd = g.select(col("np"), col("nn")).rdd
      .map(r => (r.getLong(0), r.getLong(1))).cache()
    // pass 1: per-partition negative totals → prefix offsets (O(P))
    val negTotals = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.map(_._2).sum))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = negTotals.scanLeft(0L)(_ + _)
    // pass 2: running fold inside each partition from its offset
    val sums = rdd.mapPartitionsWithIndex { (i, it) =>
      var cumneg = offsets(i); var num2 = 0L; var np = 0L; var nn = 0L
      it.foreach { case (p, n) =>
        num2 += p * (2L * cumneg + n); cumneg += n; np += p; nn += n
      }
      Iterator((num2, np, nn))
    }.reduce { case ((a1, b1, c1), (a2, b2, c2)) => (a1 + a2, b1 + b2, c1 + c2) }
    rdd.unpersist(blocking = false)
    val (num2, np, nn) = sums
    // same evaluation order + HALF_UP rounding as `round(x, 9)` on
    // both engines (Spark round == BigDecimal HALF_UP on doubles)
    val auc = if (np == 0L || nn == 0L) 0.0
      else BigDecimal(num2.toDouble / (2.0 * np * nn))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((np, nn, num2, auc)).toDF("n_pos", "n_neg", "num2", "auc")
  }

  /** Information-gain DECISION STUMP over an integer feature: evaluate
    * every decile boundary of `featCol` as a split threshold and
    * report, per threshold, the left/right class counts and the exact
    * scaled-long gain — the caller picks the max row (or reads them
    * all as a split-quality curve). Entropies are the Σ c·ln9 form:
    * `ent_sum9(n, p) = −(p·ln9(p/n) + (n−p)·ln9((n−p)/n))`, already
    * count-weighted, so `gain9 = root − (left + right)` is exact long
    * arithmetic with no division at all.
    *
    * Scale shape: boundaries from ONE mergeable percentile aggregate
    * (the q164 path); candidate evaluation is one pass amplified by
    * the FIXED threshold count (explode of a 9-element literal), into
    * one tiny (threshold)-keyed agg. */
  /** MANN–WHITNEY U rank-sum test statistic (Mann & Whitney 1947;
    * Wilcoxon 1945) — the nonparametric two-sample location test an
    * experimentation platform runs when metric distributions are
    * skewed (where the t-test's mean is meaningless). Doubled-rank
    * integer arithmetic keeps midpoint tie-ranks exact:
    *
    *   2·avgrank(v) = 2·cumBefore(v) + cnt(v) + 1
    *   2·R₁ = Σ_v n₁(v)·(2·cumBefore(v) + cnt(v) + 1)
    *   2·U₁ = 2·R₁ − n₁(n₁+1)          2·U₂ = 2·n₁·n₂ − 2·U₁
    *
    * so the statistic is an exact integer on any engine (U₁+U₂ =
    * n₁n₂ is asserted in MlEvalSpec). The group-1 indicator follows
    * [[aucExact]] — in fact AUC = U₁/(n₁n₂); the two share the
    * doubled-rank trick.
    *
    * Scale: one (value) key shuffle collapses N rows to the distinct-
    * value grid, then the same two-pass per-partition prefix fold as
    * [[aucExact]] — no single-partition window, O(P) driver state.
    *
    * @param valueCents integer-scaled metric column (exactness needs
    *                   an integer domain — scale doubles first).
    * @return one row: (n1, n2, r1_x2, u1_x2, u2_x2). */
  def mannWhitneyU(df: DataFrame, valueCents: org.apache.spark.sql.Column,
                   inGroup1: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val g = df.select(valueCents.cast("long").as("v"),
        inGroup1.cast("boolean").as("g1"))
      .groupBy(col("v"))
      .agg(sum(when(col("g1"), 1L).otherwise(0L)).as("n1"),
        count(lit(1)).as("cnt"))
      .orderBy(col("v"))
    val rdd = g.select(col("n1"), col("cnt")).rdd
      .map(r => (r.getLong(0), r.getLong(1))).cache()
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.map(_._2).sum))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val (r1x2, n1, n) = rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = offsets(i); var r2 = 0L; var c1 = 0L; var ct = 0L
      it.foreach { case (g1, cnt) =>
        r2 += g1 * (2L * cum + cnt + 1L); cum += cnt; c1 += g1; ct += cnt
      }
      Iterator((r2, c1, ct))
    }.reduce { case ((a1, b1, c1), (a2, b2, c2)) => (a1 + a2, b1 + b2, c1 + c2) }
    rdd.unpersist(blocking = false)
    val n2 = n - n1
    val u1x2 = r1x2 - n1 * (n1 + 1L)
    Seq((n1, n2, r1x2, u1x2, 2L * n1 * n2 - u1x2))
      .toDF("n1", "n2", "r1_x2", "u1_x2", "u2_x2")
  }

  /** Exact per-group lower WEIGHTED median — the robust center for
    * weighted populations (revenue-weighted price, token-weighted doc
    * stat) where the unweighted median ([[graft.queries]] q104/q114
    * family) answers the wrong question. Definition: the smallest
    * value v whose cumulative weight reaches half the total,
    * 2·cumw(v) ≥ totw — all-integer comparisons, so the boundary is
    * engine-exact.
    *
    * Scale: one (key, value) partial-agg shuffle collapses rows to
    * the per-key value GRID, and the windows run over that grid (per
    * key, bounded by value cardinality) — never over raw rows.
    *
    * @return (key, wmedian_cents, tot_weight). */
  def weightedMedian(df: DataFrame, keyCol: String,
                     valueCents: org.apache.spark.sql.Column,
                     weight: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(col(keyCol).as("k"), valueCents.cast("long").as("v"),
        weight.cast("long").as("w"))
      .groupBy(col("k"), col("v")).agg(sum(col("w")).as("wv"))
    val cum = g.withColumn("cum",
        sum(col("wv")).over(Window.partitionBy(col("k")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("wv")).over(Window.partitionBy(col("k"))))
    cum.filter(lit(2) * col("cum") >= col("tot"))
      .groupBy(col("k").as(keyCol))
      .agg(min(col("v")).as("wmedian_cents"), max(col("tot")).as("tot_weight"))
  }

  def decisionStump(df: DataFrame, featCol: String, posCol: String,
                    nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need at least two bins")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val bounds = df.agg(percentile_approx(col(featCol).cast("long"),
      typedLit(qs), lit(1000000)).as("_bs"))
    // c·ln9(c/n) as an exact long; 0 when c = 0 (lim x→0 x·ln x = 0)
    def cLn9(c: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      when(c > 0L, c * graft.util.Exact.scaled(
        round(log(c.cast("double") / n.cast("double")), 9), 9)).otherwise(0L)
    def entSum9(n: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =
      -(cLn9(p, n) + cLn9(n - p, n))
    val perThreshold = df
      .select(col(featCol).cast("long").as("f"),
        col(posCol).cast("boolean").as("p"))
      .crossJoin(broadcast(bounds))
      .select(explode(col("_bs")).as("threshold"), col("f"), col("p"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("p"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("f") <= col("threshold"), 1L).otherwise(0L)).as("n_left"),
        sum(when(col("f") <= col("threshold") && col("p"), 1L).otherwise(0L))
          .as("pos_left"))
    perThreshold
      .select(col("threshold"), col("n_left"), col("pos_left"),
        (col("n") - col("n_left")).as("n_right"),
        (col("n_pos") - col("pos_left")).as("pos_right"),
        (entSum9(col("n"), col("n_pos")) -
          (entSum9(col("n_left"), col("pos_left")) +
            entSum9(col("n") - col("n_left"),
              col("n_pos") - col("pos_left")))).as("gain9"))
      .orderBy(col("threshold"))
  }

  /** RANK-BIASED OVERLAP (Webber et al. 2010) between two top-k
    * rankings per group, at persistence p = ½ — the top-weighted
    * ranking-agreement metric (how much does an approximate ranker
    * disagree with the exact one, counting disagreement near rank 1
    * far more than at the tail).
    *
    * p = ½ makes the whole metric EXACT INTEGER arithmetic:
    * RBO@k = Σ_{d=1..k} 2^−d·o_d/d (the (1−p)/p factor is 1), and a
    * matched item at ranks (ra, rb) contributes to every depth
    * d ≥ max(ra, rb) — so its total contribution is the precomputed
    * integer F[max(ra,rb)] = Σ_{d=m..k} 2^(k−d)·(lcm/d) over the
    * common denominator D = 2^k·lcm(1..k). The metric is then ONE
    * equi join on (group, item) + one lookup + one sum — no per-depth
    * pass, no floats until the final division.
    *
    * @param a,b frames with (groupCol, itemCol, rankCol ∈ 1..k).
    * @return (group, n_matches, rbo_num, rbo_den, rbo9); identical
    *         rankings score 1 − 2^−k (truncated RBO's ceiling). */
  def rboHalf(a: DataFrame, b: DataFrame, groupCol: String, itemCol: String,
              rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 30, "integer weights need k in [1, 30]")
    val lcm = (1 to k).foldLeft(1L) { (l, d) =>
      l / BigInt(l).gcd(BigInt(d)).toLong * d }
    val den = lcm * (1L << k)
    val fTable: Seq[Long] =
      (1 to k).map(m => (m to k).map(d => (1L << (k - d)) * (lcm / d)).sum)
    val fLit = typedLit(fTable)
    val qa = a.select(col(groupCol).as("g"), col(itemCol).as("item"),
      col(rankCol).as("ra"))
    val qb = b.select(col(groupCol).as("g"), col(itemCol).as("item"),
      col(rankCol).as("rb"))
    val sums = qa.join(qb, Seq("g", "item"))
      .select(col("g"),
        element_at(fLit, greatest(col("ra"), col("rb")).cast("int")).as("f"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_matches"), sum(col("f")).as("rbo_num"))
    qa.select(col("g")).distinct()
      .join(sums, Seq("g"), "left")
      .select(col("g"), coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("rbo_num"), lit(0L)).as("rbo_num"),
        lit(den).as("rbo_den"),
        round(coalesce(col("rbo_num"), lit(0L)).cast("double") / den.toDouble,
          9).as("rbo9"))
      .orderBy(col("g"))
  }

  /** NDCG@k (Järvelin & Kekäläinen 2002) per group — the graded-
    * relevance ranking metric: how close is the system's top-k order
    * to the best achievable order, with gains 2^rel − 1 discounted by
    * 1/log2(rank + 1).
    *
    * Determinism discipline: the discount table
    * `w9[r] = round(1/log2(r+1), 9)·10^9` is precomputed HERE as
    * integer literals (no engine ever evaluates log2), so both DCG and
    * ideal DCG are exact long sums Σ gain·w9[rank]; the only float op
    * is the final one-division `round(dcg/idcg, 9)`. The ideal
    * ranking re-ranks the FULL candidate set by (rel DESC, item ASC)
    * — a per-group keyed window, no global sort.
    *
    * @param df      one row per (group, candidate): integer relevance
    *                grade `relCol` ∈ [0, 10] and the system's rank
    *                `rankCol` (1-based; rows ranked past k still
    *                compete for the ideal top-k).
    * @return (group, dcg_num, idcg_num, ndcg9); empty-gain groups
    *         (all rel = 0) score 0. */
  def ndcgAtK(df: DataFrame, groupCol: String, itemCol: String,
              relCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val w9: Seq[Long] = ndcgWeights9(k)
    val wLit = typedLit(w9)
    val base = df.select(col(groupCol).as("g"), col(itemCol).as("item"),
      col(relCol).cast("long").as("rel"), col(rankCol).cast("long").as("rk"))
    val gain = expr("shiftleft(CAST(1 AS BIGINT), CAST(rel AS INT)) - 1")
    val ideal = base.withColumn("irk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("rel").desc, col("item"))))
    ideal
      .groupBy(col("g"))
      .agg(
        sum(when(col("rk").between(1L, k.toLong),
          gain * element_at(wLit, col("rk").cast("int"))).otherwise(0L))
          .as("dcg_num"),
        sum(when(col("irk") <= k,
          gain * element_at(wLit, col("irk"))).otherwise(0L))
          .as("idcg_num"))
      .withColumn("ndcg9", when(col("idcg_num") > 0L,
        round(col("dcg_num").cast("double") / col("idcg_num").cast("double"),
          9)).otherwise(lit(0.0)))
      .orderBy(col("g"))
  }

  /** The shared scaled-long NDCG discount table — public so the
    * DuckDB oracle embeds the SAME integers instead of re-deriving
    * log2 in a second libm. */
  def ndcgWeights9(k: Int): Seq[Long] =
    (1 to k).map { r =>
      BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000000L)).toLongExact
    }

  /** Reliability-diagram (calibration) bins for a scored binary
    * signal — the third leg of the eval family beside [[aucExact]]
    * (ranking) and [[decisionStump]] (thresholding): does the score's
    * LEVEL track the positive rate? Decile boundaries come from the
    * same one-row mergeable percentile aggregate as the stump; each
    * row's bin is the count of thresholds STRICTLY below its score
    * (ties fall left), computed by a fold over the broadcast 9-element
    * boundary array — no join fan-out, no window.
    *
    * @return per bin: bin, n, n_pos, sum_score (exact), min/max score,
    *         pos_rate9. */
  def calibrationBins(df: DataFrame, scoreCol: String, posCol: String,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need at least two bins")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val bounds = df.agg(percentile_approx(col(scoreCol).cast("long"),
      typedLit(qs), lit(1000000)).as("_bs"))
    df.select(col(scoreCol).cast("long").as("f"),
        col(posCol).cast("boolean").as("p"))
      .crossJoin(broadcast(bounds))
      .withColumn("bin",
        expr("aggregate(_bs, 0, (acc, t) -> acc + IF(f > t, 1, 0))")
          .cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("p"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("f")).as("sum_score"),
        min(col("f")).as("min_score"), max(col("f")).as("max_score"))
      .withColumn("pos_rate9",
        round(col("n_pos").cast("double") / col("n").cast("double"), 9))
      .orderBy(col("bin"))
  }

  /** PER-GROUP exact AUC — [[aucExact]] stratified by a segment
    * column (the fairness/segment-quality report: a score can rank
    * well globally while failing one language or cohort): identical
    * doubled-rank integer statistic per group, with the prefix fold
    * expressed as a per-group window over the VALUE-COMPRESSED
    * (group, score) count table — rows = distinct scores per group,
    * never data rows.
    *
    * @return (group, n_pos, n_neg, num2, auc) per group; auc 0.0 for
    *         single-class groups (the [[aucExact]] convention). */
  def aucExactByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                      posCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(col(groupCol).as("g"),
        col(scoreCol).cast("long").as("s"),
        col(posCol).cast("boolean").as("p"))
      .groupBy(col("g"), col("s"))
      .agg(sum(when(col("p"), 1L).otherwise(0L)).as("np"),
        sum(when(col("p"), 0L).otherwise(1L)).as("nn"))
    val w = Window.partitionBy(col("g")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cumneg", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cumneg") + col("nn"))).as("num2"))
      .select(col("g").as(groupCol), col("n_pos"), col("n_neg"),
        col("num2"),
        when(col("n_pos") === 0 || col("n_neg") === 0, 0.0)
          .otherwise(round(col("num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 9)).as("auc"))
  }

  /** Poisson(1) inverse-CDF thresholds quantized to 24 bits — the
    * replicate-weight table shared verbatim by the engine plan and
    * the oracle SQL (same JVM computes both, so the double→int
    * quantization is identical by construction). Tail truncated at
    * weight 9 (P ≈ 1e-7), identically on both engines. */
  private[graft] val PoissonThresholds24: Seq[Long] = {
    val m = 1L << 24
    var fact = 1.0
    var s = 0.0
    (0 to 8).map { k =>
      if (k > 0) fact *= k
      s += math.exp(-1.0) / fact
      math.min((s * m).toLong, m - 1)
    }
  }

  /** POISSON BOOTSTRAP of a per-group mean — the web-scale resampling
    * scheme (each row independently contributes a Poisson(1) weight
    * per replicate, so a "resample" never needs global coordination;
    * Chamandy et al. 2012): `reps` full bootstrap replicates of
    * mean(vCol) per group in ONE pass over the data, from which any
    * downstream CI is two quantiles over `reps` numbers.
    *
    * Derandomized: the weight is the Poisson inverse-CDF of a 24-bit
    * uniform drawn from md5(id:rep) — the engine's portable-hash
    * idiom (q113's race, q98's SimHash), zero RNG state, identical
    * row weights on any engine or partitioning.
    *
    * Scale: the replicate fan-out is a generated column (×reps rows
    * map-side, never materialized through the shuffle — partial
    * aggregation collapses to groups×reps cells before exchange).
    *
    * @return (groupCol, rep, n_eff, wsum, mean9) — one row per
    *         (group, replicate); mean9 NULL if the replicate drew
    *         total weight 0. */
  def poissonBootstrap(df: DataFrame, groupCol: String, idCol: String,
                       vCol: String, reps: Int = 50): DataFrame = {
    require(reps >= 1, "need at least one replicate")
    // flat IF-sum, not aggregate(array, …): a higher-order-function
    // fold is excluded from whole-stage codegen and was evaluated
    // interpreted per (row × replicate); the unrolled 9-term sum is
    // the identical arithmetic inside codegen (round-11, guide §4)
    val wSum = PoissonThresholds24
      .map(t => s"IF(u >= ${t}L, 1L, 0L)").mkString(" + ")
    df.select(col(groupCol).as("g"), col(idCol).cast("string").as("id"),
        col(vCol).cast("long").as("x"))
      .withColumn("rep", explode(sequence(lit(1), lit(reps))))
      .withColumn("u", expr(
        "cast(conv(substring(md5(concat(id, ':', rep)), 1, 6), 16, 10) as bigint)"))
      .withColumn("w", expr(wSum))
      .groupBy(col("g"), col("rep"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("x")).as("wsum"))
      .select(col("g").as(groupCol), col("rep").cast("long").as("rep"),
        col("n_eff"), col("wsum"),
        when(col("n_eff") === 0, lit(null)).otherwise(
          round(col("wsum").cast("double") / col("n_eff").cast("double"), 9))
          .as("mean9"))
  }

  /** ISOTONIC CALIBRATION over the [[calibrationBins]] reliability
    * bins — the pool-adjacent-violators fit, computed by the exact
    * MINIMAX characterization of isotonic regression (Barlow et al.
    * 1972): fit_i = max_{j≤i} min_{k≥i} mean(y_j..y_k), with weighted
    * interval means from the prefix-summed (n, n_pos) bin table.
    * Where the raw per-bin positive rate can zig-zag on thin bins,
    * the isotonic fit is the best monotone approximation — the map
    * score→P(pos) actually usable as a calibrated probability.
    *
    * Determinism: interval means are round-9 doubles from exact
    * integer prefix sums (one fixed IEEE division each); min/max over
    * those quantized values is order-free. Everything after the one
    * bins aggregation runs on O(nBins²) rows — driver-free, constant
    * work regardless of data size.
    *
    * @return (bin, n, n_pos, pos_rate9, fit9) — fit9 monotone
    *         non-decreasing in bin. */
  def isotonicCalibration(df: DataFrame, scoreCol: String, posCol: String,
                          nBins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = calibrationBins(df, scoreCol, posCol, nBins)
      .select(col("bin"), col("n"), col("n_pos"), col("pos_rate9"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bins.select(col("bin"), col("n"), col("n_pos"),
      col("pos_rate9"), sum(col("n")).over(w).as("cn"),
      sum(col("n_pos")).over(w).as("cp"))
    val lo = pre.select(col("bin").as("j"),
      (col("cn") - col("n")).as("cn0"), (col("cp") - col("n_pos")).as("cp0"))
    val hi = pre.select(col("bin").as("k"), col("cn").as("cn1"),
      col("cp").as("cp1"))
    val iv = lo.join(hi, col("j") <= col("k"))
      .select(col("j"), col("k"),
        round((col("cp1") - col("cp0")).cast("double") /
          (col("cn1") - col("cn0")).cast("double"), 9).as("m9"))
    val idx = bins.select(col("bin").as("i"))
    val fit = idx
      .join(iv, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("m9")).as("lo9"))
      .groupBy(col("i")).agg(max(col("lo9")).as("fit9"))
    bins.join(fit, bins("bin") === fit("i"))
      .select(col("bin"), col("n"), col("n_pos"), col("pos_rate9"),
        col("fit9"))
      .orderBy(col("bin"))
  }

  /** Per-group OLS trend line y = a + b·x from EXACT sufficient
    * statistics — the distributed linear-regression formulation:
    * everything the fit needs is five mergeable sums
    * (n, Σx, Σy, Σxy, Σx²), so the whole regression is ONE partial
    * aggregate per group, commutative and associative — the map-side
    * combine does almost all the work and the shuffle carries five
    * numbers per group regardless of data size. At 100 TB that is the
    * only shape that works; iterative solvers and per-group collects
    * are both non-starters for a closed-form fit.
    *
    * Inputs must already be integral (epoch seconds, scaled-long
    * values); sums accumulate as DECIMAL(38,0) so cross products like
    * Σxy stay exact far beyond Long range. The slope/intercept emit as
    * UNROUNDED doubles derived from one decimal→double cast + one IEEE
    * division each (deterministic bits); callers own presentation
    * rounding — round(·,k) is only cross-engine-stable while
    * magnitude·10^k stays within double precision, so the right k
    * depends on the caller's units. The five exact sums emit alongside
    * so the oracle pins the integer state bit-for-bit.
    *
    * @return (key, n, sx, sy, sxy, sxx, slope, icept). */
  /** THEIL–SEN robust trend slope per group — the median of all
    * pairwise slopes (Theil 1950 / Sen 1968), the robust-regression
    * leg beside [[olsTrend]]: a 29%-breakdown estimator a handful of
    * outliers cannot move, where one wild point drags OLS arbitrarily.
    *
    * Pairs are generated per group with `xa < xb` (vertical pairs
    * dx = 0 are skipped, the standard convention), each slope is ONE
    * IEEE division of two exact long deltas — deterministic bits on
    * any engine — and the median is the DISCRETE lower median: the
    * value at row (n+1) div 2 under the slope order. Ties in the
    * slope value make rank assignment engine-dependent but the VALUE
    * at any rank deterministic, which is all the output exposes.
    *
    * Scale: the pair stage is O(Σ g²) — the irreducible Theil–Sen
    * shape — bounded by `maxGroupSize` (groups larger than the cap
    * are dropped before pairing, the [[graft.ops.Recommend]]
    * prolific-key discipline; at 100 TB you run Theil–Sen per
    * bounded entity, never on one giant series).
    *
    * @return (key, n_points, n_pairs, median_slope9). */
  def theilSenSlope(df: DataFrame, keyCol: String, xCol: String,
                    yCol: String, maxGroupSize: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxGroupSize >= 2, "pairs need at least two points")
    val pts = df.select(col(keyCol).as("g"), col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    // staged: `kept` feeds THREE consumers (both pair-join sides and
    // the derived pair-count table below) — unsnapshotted, the scan +
    // cap-join replayed in each (round-12, guide §2)
    val kept = graft.util.Snapshots.stage(pts.join(
      pts.groupBy(col("g")).agg(count(lit(1)).as("ng"))
        .filter(col("ng") <= maxGroupSize), Seq("g")))
    // pair count DERIVED, not window-counted (round-12, guide §2.3):
    // the pair stage emits exactly the ordered-by-x pairs, so per
    // group  np = C(ng, 2) − Σ_x C(c_x, 2)  — total unordered row
    // pairs minus the vertical (equal-x) pairs the join skips; every
    // remaining pair appears exactly once (the smaller x first). An
    // exact integer identity computed on the O(n) point table, which
    // removes (a) the unbounded count-window's second full pass over
    // the O(Σn²) slope buffer and (b) the ng/np columns from the
    // slope rows — the ranking exchange now carries (g, slope) only.
    val npTbl = kept.groupBy(col("g"), col("ng"), col("x"))
      .agg(count(lit(1)).as("cx"))
      .groupBy(col("g"), col("ng"))
      .agg(sum(expr("cx * (cx - 1) div 2")).as("vp"))
      .select(col("g"), col("ng"),
        (expr("ng * (ng - 1) div 2") - col("vp")).as("np"))
    val slopes = kept.as("a").join(kept.as("b"),
        col("a.g") === col("b.g") && col("a.x") < col("b.x"))
      .select(col("a.g").as("g"),
        ((col("b.y") - col("a.y")).cast("double") /
          (col("b.x") - col("a.x")).cast("double")).as("slope"))
    // the join back is on the window's own partition key over a sorted
    // stream — no new exchange or sort touches the slope table; npTbl
    // is O(groups) rows
    val ranked = slopes
      .withColumn("rk", row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("slope"))))
    ranked.join(npTbl, Seq("g"))
      .filter(col("rk").cast("long") === expr("(np + 1L) div 2L"))
      .select(col("g"), col("ng").as("n_points"),
        col("np").cast("long").as("n_pairs"),
        round(col("slope"), 9).as("median_slope9"))
      .orderBy(col("g"))
  }

  def olsTrend(df: DataFrame, keyCol: String, xCol: String,
               yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val x19 = col(xCol).cast("decimal(19,0)")
    val y19 = col(yCol).cast("decimal(19,0)")
    val agg = df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(xCol).cast(d38)).as("sx"),
        sum(col(yCol).cast(d38)).as("sy"),
        sum((x19 * y19).cast(d38)).as("sxy"),
        sum((x19 * x19).cast(d38)).as("sxx"))
    olsDerive(agg)
      .select(col(keyCol), col("n"), col("sx"), col("sy"), col("sxy"),
        col("sxx"), col("slope"), col("icept"))
      .orderBy(col(keyCol))
  }

  /** Attach (slope, icept) to a frame carrying [[olsTrend]]'s five
    * exact sufficient-stat columns (n, sx, sy, sxy, sxx). Exposed so
    * a caller holding per-group stats can roll them up to a coarser
    * key — decimal sums are exact, so Σ of per-group sums equals the
    * direct aggregation bit-for-bit and the derived slope is the
    * identical double (round-12: q260's overall-scope trend now rolls
    * up the per-type stats instead of re-scanning the input). */
  def olsDerive(stats: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val nD = col("n").cast(d38)
    val num = (nD * col("sxy") - col("sx") * col("sy")).cast(d38)
    val den = (nD * col("sxx") - col("sx") * col("sx")).cast(d38)
    val slope = num.cast("double") / den.cast("double")
    val icept = (col("sy").cast("double") - slope * col("sx").cast("double")) /
      col("n").cast("double")
    stats.withColumn("slope", slope).withColumn("icept", icept)
  }

  /** CUPED variance reduction for A/B metrics (Deng, Xu, Kohavi &
    * Walker, WSDM 2013 — the experimentation-platform standard): the
    * post-period metric Y is adjusted by the pre-period covariate X,
    *   Ŷ = Y − θ·(X − X̄),  θ = cov(X,Y)/var(X)  (pooled),
    * which preserves the treatment-effect estimate while shrinking
    * its variance by the X,Y correlation². Everything reduces to the
    * five decimal(38,0) moment sums (n, Σx, Σy, Σxy, Σx², Σy²) —
    * [[olsTrend]]'s closed-form discipline — so per arm this reports
    * the raw and CUPED-adjusted means, and pooled θ plus the achieved
    * variance ratio var(Y−θX)/var(Y) = 1 − ρ², from ONE aggregate
    * pass over per-unit rows. θ and the ratio are single double
    * divisions round-9/6; arm means are exact-sum/count divisions.
    *
    * Shape: one shuffle to per-unit (x, y, arm), one partial-agg to
    * the per-arm moment rows, pooled = the 2-row rollup broadcast
    * back. At 100 TB the moments are all that ever crosses the wire.
    *
    * @param units one row per experiment unit: (armCol int,
    *              xCol long — pre-period covariate, yCol long —
    *              post-period metric, both in integral units).
    * @return one row per arm: (arm, n_units, mean_x6, mean_y6,
    *         adj_mean6, theta9, var_ratio6). */
  def cuped(units: DataFrame, armCol: String, xCol: String,
            yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val byArm = units.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol).cast(dec)).as("sx"),
        sum(col(yCol).cast(dec)).as("sy"),
        sum((col(xCol).cast(dec) * col(yCol).cast(dec))).as("sxy"),
        sum((col(xCol).cast(dec) * col(xCol).cast(dec))).as("sxx"),
        sum((col(yCol).cast(dec) * col(yCol).cast(dec))).as("syy"))
    val pooled = byArm.agg(sum(col("n")).as("pn"),
      sum(col("sx")).as("psx"), sum(col("sy")).as("psy"),
      sum(col("sxy")).as("psxy"), sum(col("sxx")).as("psxx"),
      sum(col("syy")).as("psyy"))
    val withPool = byArm.crossJoin(broadcast(pooled))
    val covNum = (col("pn").cast(dec) * col("psxy") -
      col("psx") * col("psy")).cast("double")
    val varXNum = (col("pn").cast(dec) * col("psxx") -
      col("psx") * col("psx")).cast("double")
    val varYNum = (col("pn").cast(dec) * col("psyy") -
      col("psy") * col("psy")).cast("double")
    // var(X) = 0 (constant/absent covariate — the cold-start case):
    // CUPED degrades to the raw means (θ = 0, no variance reduction)
    // instead of poisoning every arm with 0/0 = NaN
    val theta = when(varXNum === 0.0, lit(0.0))
      .otherwise(round(covNum / varXNum, 9))
    // 1 − ρ² computed from the same moment numerators (the shared
    // n²·denominators cancel in the ratio)
    val varRatio = when(varXNum === 0.0 || varYNum === 0.0, lit(1.0))
      .otherwise(round(lit(1.0) - (covNum / varXNum) *
        (covNum / varYNum), 6))
    val meanX = round(col("sx").cast("double") / col("n").cast("double"), 6)
    val meanY = round(col("sy").cast("double") / col("n").cast("double"), 6)
    val poolMeanX = col("psx").cast("double") / col("pn").cast("double")
    withPool.select(col("arm"), col("n").as("n_units"),
        meanX.as("mean_x6"), meanY.as("mean_y6"),
        round((col("sy").cast("double") / col("n").cast("double")) -
          theta * ((col("sx").cast("double") / col("n").cast("double")) -
            poolMeanX), 6).as("adj_mean6"),
        theta.as("theta9"), varRatio.as("var_ratio6"))
      .orderBy(col("arm"))
  }

  /** KRIPPENDORFF'S ALPHA (nominal) — the multi-rater,
    * missing-data-tolerant agreement coefficient generalizing q290's
    * two-rater Cohen's kappa (Krippendorff, "Content Analysis", 2004;
    * the label-QA standard when annotator counts vary per item).
    * α = 1 − D_o/D_e over the coincidence matrix; for nominal data
    * every term reduces to integer pair counts EXCEPT the per-unit
    * 1/(m_u−1) weight — which this formulation clears EXACTLY by
    * scaling with K = lcm(1..maxRaters−1), so
    *   doK        = Σ_u D_u · K/(m_u−1)      (exact long; D_u =
    *                m_u(m_u−1) − Σ_c m_uc(m_uc−1) = disagreeing
    *                ordered pairs in unit u)
    *   n_c        = Σ_{pairable u} m_uc      (coincidence marginals —
    *                integers, the (m_u−1) cancels)
    *   α          = 1 − doK·(n−1) / (K·(n² − Σ_c n_c²))
    * — one double division at the end (round-9), everything before it
    * decimal(38,0)-exact. Units with m_u < 2 are unpairable and drop;
    * De = 0 (all ratings one category) → α null (undefined).
    *
    * Rater IDENTITY never enters nominal α — only the multiset of
    * values per unit — so the input is just (unit, value) rows.
    * Shape: one groupBy(unit, value) partial agg, one groupBy(unit),
    * one O(#categories) marginal agg; scalars attach by broadcast
    * cross join. No pair join — D_u comes from counts, not pairs.
    *
    * @param maxRaters upper bound on ratings per unit (pins K;
    *                  enforced). @return one row:
    *                  (n_units, n_values, do_k, alpha9). */
  def krippendorffAlpha(ratings: DataFrame, unitCol: String,
                        valueCol: String, maxRaters: Int = 4): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 8, "pin a small rater bound")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val k = (1L until maxRaters.toLong).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    val uc = ratings.groupBy(col(unitCol).as("u"), col(valueCol).as("c"))
      .agg(count(lit(1)).as("muc"))
    val units = uc.groupBy(col("u"))
      .agg(sum(col("muc")).as("mu"),
        sum(col("muc") * (col("muc") - 1)).as("agree2"))
      .where(col("mu") >= 2)
    // exact per-unit disagreement, cleared of the 1/(mu−1) weight
    // ((mu−1) divides K by construction — div is exact, not floor)
    val doK = units
      .select(when(col("mu") > maxRaters, raise_error(
          lit(s"krippendorffAlpha: a unit exceeds maxRaters=$maxRaters")))
        .otherwise((col("mu") * (col("mu") - 1) - col("agree2")) *
          expr(s"$k div (mu - 1)")).as("duk"))
      .agg(sum(col("duk")).as("do_k"), count(lit(1)).as("n_units"))
    // nc² summed in decimal(38,0): a long product silently wraps once a
    // category's marginal passes ~3·10⁹ ratings, and the DuckDB oracle
    // computes this term in HUGEINT — the decimal cast keeps the
    // "everything before the final division is decimal(38,0)-exact"
    // contract true at any panel size (the cuped moment-sum pattern)
    val marg = uc.join(units.select(col("u")), Seq("u"), "left_semi")
      .groupBy(col("c")).agg(sum(col("muc")).as("nc"))
      .agg(sum(col("nc")).as("n"),
        sum(col("nc").cast("decimal(38,0)") * col("nc").cast("decimal(38,0)"))
          .as("nc2"))
    val nDec = col("n").cast("decimal(38,0)")
    doK.crossJoin(broadcast(marg))
      .select(col("n_units"), col("n").as("n_values"), col("do_k"),
        when(nDec * col("n") === col("nc2").cast("decimal(38,0)"),
          lit(null).cast("double"))
          .otherwise(round(lit(1.0) -
            (col("do_k").cast("decimal(38,0)") * (col("n") - 1))
              .cast("double") /
            (lit(k).cast("decimal(38,0)") * (nDec * col("n") - col("nc2")))
              .cast("double"), 9))
          .as("alpha9"))
  }

  /** Local-differential-privacy release via randomized response
    * (Warner, JASA 1965; the mechanism RAPPOR builds on — Erlingsson
    * et al., CCS 2014), DERANDOMIZED: each unit's binary truth is
    * flipped iff the first four hex chars of md5(id) fall below
    * `flipHexCeil` — e.g. "4000" = 16384/65536 = exactly ¼, the
    * ε = ln 3 mechanism. The hash draw replaces the RNG the same way
    * the engine's sampling family does (q61/q113): per-unit
    * consistent, reshuffle-stable, zero RNG state at 100 TB, and the
    * release replays bit-for-bit on any engine with md5.
    *
    * Output is the CALIBRATION AUDIT of the release: per cohort the
    * observed (privatized) positive count beside the debiased estimate
    * p̂ = (obs/n − p)/(1 − 2p) and the true rate the mechanism is
    * estimating — the validation table a privacy team publishes on
    * known data before trusting the mechanism on data it may not keep.
    * All counts are exact integer sums; the two rates are single IEEE
    * divisions of exact longs (est_rate clears to (obs·2ᵏ − n·flips) /
    * (n·(2ᵏ − 2·flips)) in integer units of 2⁻¹⁶).
    *
    * Scale shape: the flip is one codegen'd md5 compare riding the
    * per-unit rows; the release is ONE partial-agg cohort shuffle.
    *
    * @param units one row per reporting unit: (id, truth ∈ {0,1}, cohort)
    * @param flipHexCeil 4 lowercase hex chars; flip prob = hex/65536. */
  def ldpRandomizedResponse(units: DataFrame, idCol: String,
      truthCol: String, cohortCol: String,
      flipHexCeil: String = "4000"): DataFrame = {
    require(flipHexCeil.matches("[0-9a-f]{4}"),
      "flipHexCeil: 4 lowercase hex chars")
    val flips = java.lang.Long.parseLong(flipHexCeil, 16)
    require(flips > 0 && 2 * flips != 65536L,
      "flip prob must be in (0, ½) ∪ (½, 1) for the debias to exist")
    val t = when(col(truthCol).cast("long").isin(0L, 1L),
      col(truthCol).cast("long"))
      .otherwise(raise_error(lit(
        s"ldpRandomizedResponse: $truthCol must be binary 0/1")))
    val reported = units.select(col(cohortCol).as("cohort"),
      t.as("truth"),
      when(substring(md5(col(idCol).cast("string")), 1, 4) < flipHexCeil,
        lit(1L) - t).otherwise(t).as("reported"))
    reported.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("truth")).as("true_pos"),
        sum(col("reported")).as("obs_pos"))
      .select(col("cohort"), col("n_units"), col("true_pos"), col("obs_pos"),
        (col("true_pos").cast("double") / col("n_units").cast("double"))
          .as("true_rate"),
        ((col("obs_pos") * 65536L - col("n_units") * flips).cast("double") /
          (col("n_units") * (65536L - 2L * flips)).cast("double"))
          .as("est_rate"))
      .orderBy(col("cohort"))
  }
}
