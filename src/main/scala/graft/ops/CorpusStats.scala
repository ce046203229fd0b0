package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level distribution statistics for dataset curation: domain
  * drift (KL divergence per source), consistent-hashing shard
  * placement (HRW / rendezvous), and tokenizer-fertility reports.
  *
  * Determinism discipline matches the rest of the engine: every
  * transcendental (`ln`) is rounded to 9 decimals on BOTH engines
  * before being scaled to an exact long, all sums run over exact
  * integers, and the one final division back to a double is an
  * identically-written IEEE expression (see [[TextAnalysis.tokenEntropy]]).
  */
object CorpusStats {

  private def toks(textCol: Column): Column = split(textCol, "\\s+")

  /** KL DIVERGENCE of each source's unigram distribution from the
    * whole-corpus distribution — the standard domain-drift /
    * mixture-shift monitor (cf. Xie et al. 2023's DSIR, which
    * importance-weights on exactly this ratio). For source s:
    * KL(P_s‖Q) = Σ_t P_s(t)·ln(P_s(t)/Q(t)); every term of a source
    * also appears in the corpus, so the ratio is always finite.
    *
    * Shape: ONE tokenize-explode shuffle to (source, term) counts —
    * the only pass over raw text; per-source totals, global term
    * counts, and the corpus total all re-aggregate those partials
    * (each orders of magnitude smaller than the log). The ratio
    * P/Q = (c_st·n)/(n_s·c_t) is a product of bigints evaluated
    * exactly in a double (≪ 2^53), ln is round-9-scaled, and the
    * per-source sum is an exact long until the final division.
    */
  def klDivergence(df: DataFrame, sourceCol: String, textCol: String)
      : DataFrame = {
    val st = df.select(col(sourceCol).as("src"),
        explode(toks(col(textCol))).as("tok"))
      .groupBy(col("src"), col("tok"))
      .agg(count(lit(1)).as("c_st"))
    val ns = st.groupBy(col("src")).agg(sum(col("c_st")).as("n_s"))
    val ct = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val n  = ns.agg(sum(col("n_s")).as("n"))
    val ratio = (col("c_st") * col("n")).cast("double") /
      (col("n_s") * col("c_t")).cast("double")
    st.join(ns, "src").join(ct, "tok").crossJoin(n)
      .withColumn("lnr9", graft.util.Exact.scaled(round(log(ratio), 9), 9))
      .groupBy(col("src").as("source"), col("n_s"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("c_st") * col("lnr9")).as("kl_sum9"))
      .select(col("source"), col("n_terms"), col("kl_sum9"),
        (col("kl_sum9").cast("double") / (col("n_s") * lit(1000000000L)))
          .as("kl"))
      .orderBy(col("source"))
  }

  /** RENDEZVOUS (highest-random-weight) shard assignment: each key
    * goes to the shard with the largest md5(key ":" shard) digest —
    * Thaler & Ravishankar 1998. Unlike mod-N (q129's deal), adding or
    * removing ONE shard remaps only ~1/N of the keys (only those whose
    * winning shard vanished), which is why cache/storage tiers use it.
    *
    * Shape: entirely narrow — an inline array of `shards.length`
    * (digest, name) structs folded by `array_max` inside whole-stage
    * codegen; no shuffle, no state, embarrassingly parallel at any
    * scale. Tie-break (never in practice: 128-bit digests) is the
    * larger shard name, pinned by the struct field order.
    */
  def hrwShards(df: DataFrame, idCol: String, shards: Seq[String])
      : DataFrame = {
    require(shards.nonEmpty, "need at least one shard")
    val cands = shards.map { sh =>
      struct(
        md5(concat(col(idCol).cast("string"), lit(":" + sh)).cast("binary"))
          .as("h"),
        lit(sh).as("nm"))
    }
    df.select(col(idCol),
        array_max(array(cands: _*)).getField("nm").as("shard"))
      .orderBy(col(idCol))
  }

  /** TOKENIZER FERTILITY report per language: characters per token —
    * the standard multilingual-tokenizer health metric (a language
    * with anomalously low chars/token is being shredded; one with very
    * high is under-segmented). Whitespace tokens here; the BPE
    * kernel's fertility is anchored by q115/q116.
    *
    * Shape: one narrow projection (token count = `size(split(…))` —
    * no explode) into one partial-agg shuffle on the language key.
    * chars/token is a bigint ratio rounded to 6 — exact on both
    * engines.
    */
  /** LENGTH-CURRICULUM stage assignment: each document's decile (0..
    * nStages−1) by `lenCol`, for shortest-first curriculum schedules.
    * Stage = how many of the nStages−1 exact discrete quantile
    * boundaries the length strictly exceeds — ties land in the lower
    * stage on both engines by construction.
    *
    * Shape: boundaries come from ONE `percentile_approx` aggregate
    * (the mergeable GK sketch — at accuracy ≥ N it is exact and equals
    * DuckDB's `quantile_disc`, the equivalence q104/q145 pinned); the
    * 9-element array is a broadcast literal folded into a narrow
    * codegen pass — no global sort, no ntile window.
    */
  def lengthCurriculum(df: DataFrame, idCol: String, lenCol: String,
                       nStages: Int = 10): DataFrame = {
    require(nStages >= 2, "need at least two stages")
    val qs = (1 until nStages).map(_.toDouble / nStages)
    val bounds = df.agg(percentile_approx(col(lenCol).cast("long"),
      typedLit(qs), lit(1000000)).as("_bs"))
    df.select(col(idCol), col(lenCol).cast("long").as(lenCol))
      .crossJoin(broadcast(bounds))
      .select(col(idCol), col(lenCol),
        aggregate(col("_bs"), lit(0L),
          (acc, q) => acc + when(col(lenCol) > q, 1L).otherwise(0L))
          .as("stage"))
      .orderBy(col(idCol))
  }

  /** TEMPERATURE-SCALED mixture sampling (UniMax / multilingual-LM
    * style): allocate `total` docs across groups ∝ n_g^invTemp —
    * invTemp 1.0 is proportional, 0.0 uniform, 0.5 the √-rebalancing
    * that keeps small domains from drowning. The allocation and
    * selection reuse [[TextAnalysis.mixtureSample]]'s all-integer
    * largest-remainder machinery; the only new ingredient is the
    * weight n_g^invTemp, a transcendental → round-9-scaled long
    * before any arithmetic (the ln/pow discipline).
    */
  def temperatureMixture(df: DataFrame, groupCol: String, idCol: String,
                         total: Long, invTemp: Double = 0.5): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n_g"))
    val withW = df.join(counts, groupCol)
      .withColumn("_w9", graft.util.Exact.scaled(
        round(pow(col("_n_g").cast("double"), invTemp), 9), 9))
    TextAnalysis.mixtureSample(withW, groupCol, idCol, col("_w9"), total)
  }

  def tokenFertility(df: DataFrame, langCol: String, textCol: String)
      : DataFrame =
    df.select(col(langCol).as("lang"),
        length(col(textCol)).cast("long").as("chars"),
        size(toks(col(textCol))).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("chars")).as("n_chars"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_tokens").cast("double"), 6))
      .orderBy(col("lang"))

  /** Exact two-sample Kolmogorov–Smirnov statistic between the value
    * distributions of two slices — the distribution-drift test a
    * curation pipeline runs between ingest batches / sources
    * (complement of [[klDivergence]]: KS needs no binning or smoothing
    * and is sensitive anywhere in the CDF, not just where mass is).
    *
    * Everything is integer-exact until the final division:
    * D = max_v |F₁(v) − F₂(v)| = max_v |c₁(v)·n₂ − c₂(v)·n₁| / (n₁·n₂),
    * where c are cumulative counts over the UNION of distinct values —
    * so the max runs over integer numerators and the one division is
    * deterministic. The CDFs come from value compression (the
    * rankNormalize shape): per-(value) counts, one window over the
    * distinct-value table — never over data rows.
    *
    * @return one row: n_a, n_b, d_num (= max |c₁n₂ − c₂n₁|, exact),
    *         ks9 = round(d_num/(n_a·n_b), 9). */
  def ksDrift(df: DataFrame, vCol: String, inA: Column, inB: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(vCol).as("v"),
        when(inA, 1L).otherwise(0L).as("a"),
        when(inB, 1L).otherwise(0L).as("b"))
      .filter(col("a") + col("b") > 0)
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // both windows run over the COMPRESSED distinct-value table (313
    // values here, bounded by the value domain at any scale), never
    // over data rows
    val wAll = Window.partitionBy(lit(0))
    val cum = counts
      .withColumn("fa", sum(col("ca")).over(w))
      .withColumn("fb", sum(col("cb")).over(w))
      .withColumn("na", max(col("fa")).over(wAll))
      .withColumn("nb", max(col("fb")).over(wAll))
    cum.agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(abs(col("fa") * col("nb") - col("fb") * col("na"))).as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        round(col("d_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 9).as("ks9"))
  }

  /** TRENDING TERMS between two corpus slices — the week-over-week
    * "what's new in the crawl" monitor: per term, occurrence counts
    * in slice A (before) and slice B (after), ranked by the
    * add-one-smoothed rise ratio (c_B+1)/(c_A+1) (terms absent from A
    * surface instead of dividing by zero). [[psiDrift]] says THAT the
    * distribution moved; this names the vocabulary doing the moving.
    * One tokenize shuffle, a vocab-sized TakeOrdered cut.
    *
    * @return top `k` rows (term, c_a, c_b, ratio9, rk) by
    *         (ratio DESC, c_b DESC, term). */
  def trendingTerms(df: DataFrame, textCol: String, inA: Column,
                    inB: Column, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(toks(col(textCol))).as("tok"),
        when(inA, 1L).otherwise(0L).as("a"),
        when(inB, 1L).otherwise(0L).as("b"))
      .filter((col("a") + col("b")) > 0 && col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(sum(col("a")).as("c_a"), sum(col("b")).as("c_b"))
      .withColumn("ratio9",
        round((col("c_b") + 1).cast("double") /
          (col("c_a") + 1).cast("double"), 9))
    counts
      .orderBy(col("ratio9").desc, col("c_b").desc, col("tok"))
      .limit(k)
      .withColumn("rk", row_number().over(Window.orderBy(
        col("ratio9").desc, col("c_b").desc, col("tok"))).cast("long"))
      .select(col("tok").as("term"), col("c_a"), col("c_b"),
        col("ratio9"), col("rk"))
  }

  /** LEAVE-ONE-GROUP-OUT INFLUENCE of each group on the global mean
    * of a value column — the cheapest data-valuation diagnostic:
    * delta(g) = mean(all) − mean(all \ g) says how much source g
    * drags the corpus statistic, computed in O(1) algebra per group
    * from sufficient statistics (no second pass, no per-group
    * re-aggregation — the closed-form LOO trick). A source with
    * outsized |delta| is either gold or poison; either way it gets
    * audited first.
    *
    * One groupBy pass → (n_g, s_g) per group; the global (N, S) is a
    * broadcast single row; every division is a fixed IEEE chain on
    * exact integers, round-9.
    *
    * @return (group, n_g, s_g, mean_wo9, delta9) — NULL when the
    *         group IS the corpus. */
  def leaveOneGroupOut(df: DataFrame, groupCol: String, vCol: String)
      : DataFrame = {
    val per = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_g"), sum(col(vCol).cast("long")).as("s_g"))
    val tot = per.agg(sum(col("n_g")).as("nn"), sum(col("s_g")).as("ss"))
    per.crossJoin(broadcast(tot))
      .select(col("g").as(groupCol), col("n_g"), col("s_g"),
        when(col("nn") === col("n_g"), lit(null)).otherwise(
          round((col("ss") - col("s_g")).cast("double") /
            (col("nn") - col("n_g")).cast("double"), 9)).as("mean_wo9"),
        when(col("nn") === col("n_g"), lit(null)).otherwise(
          round(col("ss").cast("double") / col("nn").cast("double") -
            (col("ss") - col("s_g")).cast("double") /
              (col("nn") - col("n_g")).cast("double"), 9)).as("delta9"))
  }

  /** POPULATION STABILITY INDEX between two slices of a value column
    * per group — the binned industry-standard drift monitor
    * ([[ksDrift]]'s complement: KS is binning-free and answers "did
    * it shift", PSI localizes WHERE mass moved and by how much):
    * PSI = Σ_bins (p_B − p_A)·ln(p_B/p_A) over slice-A decile bins.
    *
    * Bin bounds are slice-A deciles per group (percentile_approx at
    * accuracy 10⁶ — exact at gate scales, the q172/q184 boundary
    * contract); bins fan out by the q184 array-fold, no join
    * explosion. Laplace +1 smoothing on each observed cell (K =
    * observed cell count per group) keeps empty-slice bins finite
    * and both engines identical. Each bin's contribution is one
    * fixed IEEE chain (two exact-int divisions, one round-9 ln, one
    * product) rounded to a scaled long, so the per-group PSI is an
    * exact integer sum.
    *
    * Scale: one pass to bin + one (group, bin) aggregate; the
    * quantile sketch is mergeable state, the fold is codegen'd.
    *
    * @return (group, bin, c_a, c_b, contrib9, psi9) — psi9 repeated
    *         per group (Σ contrib9). */
  def psiDrift(df: DataFrame, groupCol: String, vCol: String,
               inA: Column, inB: Column, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need at least two bins")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val t = df.select(col(groupCol).as("g"), col(vCol).cast("long").as("v"),
        inA.as("a"), inB.as("b"))
      .filter(col("a") || col("b"))
    val bounds = t.filter(col("a")).groupBy(col("g"))
      .agg(percentile_approx(col("v"), typedLit(qs), lit(1000000)).as("_bs"))
    val cells = t.join(broadcast(bounds), Seq("g"))
      .withColumn("bin",
        expr("aggregate(_bs, 0, (acc, th) -> acc + IF(v > th, 1, 0))")
          .cast("long"))
      .groupBy(col("g"), col("bin"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("b"), 1L).otherwise(0L)).as("cb"))
    val totals = cells.groupBy(col("g"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        count(lit(1)).as("k"))
    val withP = cells.join(broadcast(totals), Seq("g"))
    val pa = (withP("ca") + 1).cast("double") /
      (withP("na") + withP("k")).cast("double")
    val pb = (withP("cb") + 1).cast("double") /
      (withP("nb") + withP("k")).cast("double")
    val scored = withP.select(col("g"), col("bin"),
      col("ca").as("c_a"), col("cb").as("c_b"),
      round((pb - pa) * round(log(pb / pa), 9) * lit(1000000000L))
        .cast("long").as("contrib9"))
    val psi = scored.groupBy(col("g")).agg(sum(col("contrib9")).as("psi9"))
    scored.join(broadcast(psi), Seq("g"))
      .select(col("g").as(groupCol), col("bin"), col("c_a"), col("c_b"),
        col("contrib9"), col("psi9"))
  }

  /** Zipf-law fit: the slope of ln(freq) vs ln(rank) over the top-`k`
    * corpus terms — the vocabulary-health diagnostic (natural text
    * sits near −1; template/boilerplate corpora flatten, spam
    * steepens). Composes two of the engine's exact kernels: the
    * frequency table collapses to `k` rows via TakeOrdered
    * (per-partition heaps — the only window runs on those k rows),
    * ln(·) enters as the house round-9 scaled long, and the fit is
    * [[MlEval.olsTrend]]'s five-sum closed form — so the whole
    * regression replays bit-for-bit in SQL.
    *
    * @return one row: corpus label, n, the five exact sums (as
    *         strings — they exceed 2^53), slope round-9, intercept in
    *         ln units round-6. */
  def zipfFit(df: DataFrame, textCol: String, k: Int = 500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = df.select(explode(toks(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val top = freq.orderBy(col("freq").desc, col("tok")).limit(k)
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("tok")))
        .cast("long"))
    val pts = ranked.select(lit("corpus").as("corpus"),
      graft.util.Exact.scaled(round(log(col("rank").cast("double")), 9), 9)
        .as("lnr9"),
      graft.util.Exact.scaled(round(log(col("freq").cast("double")), 9), 9)
        .as("lnf9"))
    MlEval.olsTrend(pts, "corpus", "lnr9", "lnf9")
      .select(col("corpus"), col("n"),
        col("sx").cast("string").as("sx"), col("sy").cast("string").as("sy"),
        col("sxy").cast("string").as("sxy"), col("sxx").cast("string").as("sxx"),
        round(col("slope"), 9).as("zipf_slope9"),
        round(col("icept") / 1000000000.0, 6).as("icept_ln6"))
  }

  /** GINI COEFFICIENT of the token-frequency distribution per group —
    * the standard concentration measure for corpus diagnostics: G → 0
    * means usage spread evenly over the vocabulary, G → 1 means a few
    * terms dominate (template/boilerplate-heavy text; pairs with
    * [[zipfFit]]'s slope as the power-law view of the same skew).
    *
    * Computed on the exact sorted-rank identity over term counts
    * x₍₁₎ ≤ … ≤ x₍ₙ₎:  G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx).
    * Σᵢ i·x₍ᵢ₎ is invariant under permutation of tied counts (tied
    * values occupy a fixed set of rank positions), so row_number
    * order among ties cannot change the result. All moments are
    * exact integers — decimal(38,0) here, HUGEINT in the oracle —
    * and the final division is one fixed double expression, round-9.
    *
    * Scale: the window ranks the (group, term) COUNT table, not data
    * rows — vocabulary-sized per group, orders of magnitude below the
    * corpus; one tokenize shuffle + one vocab-sized window.
    *
    * @return (groupCol, n_terms, total_c, gini9). */
  def giniConcentration(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val counts = df
      .select(col(groupCol).as("g"), explode(toks(col(textCol))).as("tok"))
      .groupBy(col("g"), col("tok")).agg(count(lit(1)).as("c"))
    val ranked = counts.withColumn("rk",
      row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("c"), col("tok"))).cast("long"))
    ranked.groupBy(col("g"))
      .agg(count(lit(1)).as("n_terms"), sum(col("c")).as("total_c"),
        sum(col("rk").cast(d38) * col("c").cast(d38)).as("src"))
      .select(col("g").as(groupCol), col("n_terms"), col("total_c"),
        round((lit(2).cast(d38) * col("src") -
            (col("n_terms") + 1).cast(d38) * col("total_c").cast(d38))
            .cast("double") /
          (col("n_terms").cast("double") * col("total_c").cast("double")), 9)
          .as("gini9"))
  }

  /** Exact per-group rank / percent-rank feature normalization WITHOUT
    * a per-row window: the row-level `percent_rank() OVER (PARTITION BY
    * group ORDER BY v)` formulation evaluates a window over every row
    * of the group — at 100 TB a billion-row-per-language sort whose
    * final pass is serial per group. This op gets the identical result
    * through VALUE COMPRESSION (the [[MlEval.aucExact]] shape):
    * groupBy (group, v) counts collapse N rows to the distinct-value
    * table, ONE window ranks that small table (rows = distinct values,
    * not data rows), and a join fans ranks back out. Ties share the
    * min-rank exactly as `rank()` assigns it.
    *
    * @return input columns + `rank` (1-based min-rank within group),
    *         `n` (group size), `pct_rank` = (rank−1)/(n−1) rounded to
    *         9 (0.0 for singleton groups, the SQL convention). */
  def rankNormalize(df: DataFrame, groupCol: String, vCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = df.groupBy(col(groupCol), col(vCol))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cnt
      .withColumn("rank", coalesce(sum(col("_c")).over(w), lit(0L)) + 1L)
      .withColumn("n", sum(col("_c")).over(Window.partitionBy(col(groupCol))))
      .drop("_c")
    df.join(ranked, Seq(groupCol, vCol))
      .withColumn("pct_rank",
        when(col("n") === 1L, lit(0.0))
          .otherwise(round((col("rank") - 1L).cast("double") /
            (col("n") - 1L).cast("double"), 9)))
  }

  /** PER-GROUP QUANTILE ALIGNMENT to the pooled distribution — the
    * drift-CORRECTION sibling of [[psiDrift]]'s detection: each row's
    * value maps to the pooled order statistic at its within-group
    * percentile (quantile normalization, Bolstad et al.
    * Bioinformatics 2003, in the unequal-group-size inverse-CDF
    * form), so every source's marginal becomes the corpus marginal
    * and a single global threshold means the same thing on every
    * source. All-integer: within-group rank rk and pooled position
    * t = ⌈rk·N / n_g⌉ (type-1 inverse CDF, computed as an exact
    * integer div) — no interpolation, no floats, replayable anywhere.
    * Conventions: ranks break ties by (value, id); rk = n_g maps to
    * the pooled max; a 1-row group maps to the pooled max (p = 1).
    *
    * Scale shape: pooled positions come from a RANGE sort +
    * per-partition zipWithIndex offsets (the q96 dense-id machinery
    * on rows — no single-partition window); within-group ranks are
    * one group-key window shuffle; the map-back is one equi join on
    * the position. N crosses the driver as an O(1) literal (the
    * TfIdf.idf pattern).
    *
    * @return df columns (groupCol, idCol, valueCol) + aligned. */
  def quantileAlign(df: DataFrame, groupCol: String, idCol: String,
                    valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).as("grp"),
      col(idCol).cast("long").as("id"), col(valueCol).cast("long").as("v"))
    val n = base.count()
    val pooled = base.select(col("v"), col("id"))
      .orderBy(col("v"), col("id"))
      .rdd.map(r => r.getLong(0))
      .zipWithIndex()
      .map { case (v, i) => (i + 1, v) }
      .toDF("pos", "aligned")
    val wg = Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))
    val ranked = base
      .withColumn("rk", row_number().over(wg).cast("long"))
      .withColumn("n_g",
        count(lit(1)).over(Window.partitionBy(col("grp"))).cast("long"))
      .withColumn("pos", expr(s"(rk * ${n}L + n_g - 1) div n_g"))
    ranked.join(pooled, Seq("pos"))
      .select(col("grp").as(groupCol), col("id").as(idCol),
        col("v").as(valueCol), col("aligned"))
  }
}
