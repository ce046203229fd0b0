package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item collaborative filtering over an interaction log — the
  * classic neighborhood recommender (Sarwar et al. 2001, "Item-based
  * collaborative filtering recommendation algorithms"; the Amazon
  * item-to-item family): two items are similar when the same users
  * touch both, cosine-normalized by each item's audience size.
  *
  * Everything is exact: co-occurrence and degree counts are integer
  * aggregates, and the only floating step is one correctly-rounded
  * `sqrt` + one IEEE division + one `round(·, 9)` — bit-identical on
  * any engine, so the whole similarity table oracle-checks.
  *
  * Scale design (100 TB interaction log):
  *  - candidate pairs are generated PER USER (self-join of each
  *    user's item set with `item_a < item_b`) — never an item×item
  *    cross product. Cost is O(Σ_u n_u²), the standard CF shape;
  *  - the quadratic term is bounded by [[itemItemCosine]]'s
  *    `maxUserItems` cap: users touching more than the cap are
  *    dropped BEFORE pairing (the published prolific-user pruning —
  *    a user with 10^5 items is a bot/crawler whose co-occurrence
  *    signal is noise anyway, and one such user alone would emit
  *    10^10 pairs). Degrees are computed over the SAME capped set so
  *    the cosine stays internally consistent;
  *  - every stage is a keyed shuffle with map-side partial
  *    aggregation: (user) for pairing, (item_a, item_b) for
  *    co-counts, (item) for degrees and the final top-N window —
  *    no global window, no driver state.
  */
object Recommend {

  /** Top-N most-similar items per item by exact co-occurrence cosine
    * `cos(a, b) = |U_a ∩ U_b| / sqrt(|U_a| · |U_b|)` over distinct
    * (user, item) interactions.
    *
    * @param df           interaction log; one row per interaction
    *                     (duplicates collapse — implicit feedback).
    * @param maxUserItems drop users with more distinct items than
    *                     this before pairing (fan-out bound).
    * @param topN         neighbors kept per item.
    * @return (item, neighbor, co, deg_i, deg_n, cosine9, rk) — both
    *         directions of each pair, ranked per item by
    *         (cosine9 DESC, co DESC, neighbor ASC). */
  def itemItemCosine(df: DataFrame, userCol: String, itemCol: String,
                     maxUserItems: Int, topN: Int): DataFrame = {
    require(maxUserItems >= 2, "pairing needs at least two items per user")
    require(topN >= 1, "topN must be positive")
    val inter = df.select(col(userCol).cast("long").as("u"),
        col(itemCol).cast("long").as("item"))
      .filter(col("u").isNotNull && col("item").isNotNull)
      .distinct()
    // prolific-user pruning: one (user) agg, rejoin, filter — bounds
    // the pair stage at cap² rows per user. Eager snapshot (round-11,
    // guide §2): `kept` feeds THREE consumers (degrees + both sides
    // of the per-user pair self-join) — unsnapshotted, the upstream
    // distinct + cap join replays in each. Round-12: staged
    // (lineage-retaining) instead of localCheckpoint — O(input) rows.
    val kept = graft.util.Snapshots.stage(inter.join(
      inter.groupBy(col("u")).agg(count(lit(1)).as("nu"))
        .filter(col("nu") <= maxUserItems).select(col("u")),
      Seq("u")))
    val deg = kept.groupBy(col("item")).agg(count(lit(1)).as("deg"))
    // SYMMETRIC co-counts from ONE pair-join evaluation (round-12,
    // guide §2.4): the old `co.unionAll(co.swapped)` physically re-ran
    // the O(Σ n_u²) per-user pair self-join + aggregation in BOTH
    // union branches (r11 q206 plan nodes 22 and 33). Emitting both
    // directions map-side (a 2-struct explode per pair) and
    // aggregating once produces the identical (item, neighbor, co)
    // multiset through a single pair join and a single exchange —
    // whose map-side partial agg collapses to the same ~2·|co-pairs|
    // rows the two old exchanges carried combined. No materialization
    // barrier needed (a staged `co` was tried: two extra snapshot
    // jobs cost more than the duplicate join saved at sf0.1).
    val sym = kept.as("a")
      .join(kept.as("b"), col("a.u") === col("b.u")
        && col("a.item") < col("b.item"))
      .select(explode(array(
        struct(col("a.item").as("item"), col("b.item").as("neighbor")),
        struct(col("b.item").as("item"), col("a.item").as("neighbor"))))
        .as("p"))
      .groupBy(col("p.item").as("item"), col("p.neighbor").as("neighbor"))
      .agg(count(lit(1)).as("co"))
    val scored = sym
      .join(deg.select(col("item"), col("deg").as("deg_i")), Seq("item"))
      .join(deg.select(col("item").as("neighbor"), col("deg").as("deg_n")),
        Seq("neighbor"))
      .withColumn("cosine9", round(col("co").cast("double") /
        sqrt((col("deg_i") * col("deg_n")).cast("double")), 9))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("item"))
          .orderBy(col("cosine9").desc, col("co").desc, col("neighbor")))
        .cast("long"))
      .filter(col("rk") <= topN)
      .select(col("item"), col("neighbor"), col("co"), col("deg_i"),
        col("deg_n"), col("cosine9"), col("rk"))
      .orderBy(col("item"), col("rk"))
  }

  /** END-TO-END recommender holdout evaluation — the temporal
    * leave-last-NOVEL-out protocol: each user's held-out test item is
    * the one whose FIRST interaction is latest (predicting the next
    * new thing, the only honest target when users re-touch most of
    * the catalog), train is everything strictly earlier, similarities
    * come from [[itemItemCosine]] over train only, and a user's
    * recommendations are the top-`k` unseen items by
    * score(u, j) = Σ_{i ∈ train(u)} sim(i, j) over each train item's
    * top-`simTopN` neighbor list.
    *
    * Determinism: scores sum the SCALED-LONG cosine9 (already
    * 9-decimal by construction, so ×10⁹ is exact) — a float sum here
    * would be partition-order dependent; ranking is
    * (score DESC, item ASC). Scale: every stage is a keyed shuffle;
    * the candidate fan-out is |train(u)|·simTopN per user, bounded by
    * the same `maxUserItems` cap the similarity build uses.
    *
    * @return ONE row: (n_users, n_hits, hit_rate9) — users evaluated
    *         (non-empty train after the split), users whose test item
    *         landed in their top-`k`, and the ratio. */
  def holdoutHitRate(df: DataFrame, userCol: String, itemCol: String,
                     orderCol: String, tieCol: String,
                     maxUserItems: Int, simTopN: Int, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val inter = df.select(col(userCol).cast("long").as("u"),
        col(itemCol).cast("long").as("item"),
        col(orderCol).cast("long").as("ord"), col(tieCol).cast("long").as("tie"))
      .filter(col("u").isNotNull && col("item").isNotNull)
    // first interaction per (user, item); test = the latest first
    val firsts = inter.groupBy(col("u"), col("item"))
      .agg(min(struct(col("ord"), col("tie"))).as("f"))
      .select(col("u"), col("item"), col("f.ord").as("ord"),
        col("f.tie").as("tie"))
    // Eager snapshots (round-11, guide §2 — compute once, reuse):
    // without them the whole upstream subtree (events scan + JSON
    // parse + the firsts agg + the split window) replays inside EVERY
    // consumer — `test` twice and `train` FOUR times (similarity
    // build, candidate join, seen-filter, evaluated count): 62 scans /
    // 146 Exchanges in the unsnapshotted q206 plan. Both are bounded:
    // test is one row per user, train the distinct train-period
    // (user, item) pairs. Values are unchanged — the snapshot only
    // materializes the same deterministic result. Round-12: staged
    // (lineage-retaining persist) instead of localCheckpoint — both
    // are O(input)-scale, so a lost executor must recompute, not
    // kill the query (guide §5).
    val test = graft.util.Snapshots.stage(firsts
      .withColumn("rn", row_number().over(Window.partitionBy(col("u"))
        .orderBy(col("ord").desc, col("tie").desc)))
      .filter(col("rn") === 1)
      .select(col("u"), col("item").as("test_item"),
        col("ord").as("t_ord"), col("tie").as("t_tie")))
    val train = graft.util.Snapshots.stage(inter.join(test, Seq("u"))
      .filter(col("ord") < col("t_ord")
        || (col("ord") === col("t_ord") && col("tie") < col("t_tie")))
      .select(col("u"), col("item")).distinct())
    val sim = itemItemCosine(train, "u", "item", maxUserItems, simTopN)
      .select(col("item"), col("neighbor"),
        graft.util.Exact.scaled(col("cosine9"), 9).as("sim9"))
    // candidate scores: every train item contributes its neighbor list;
    // items the user already touched are excluded from candidacy
    val cand = train.join(sim, Seq("item"))
      .groupBy(col("u"), col("neighbor").as("cand"))
      .agg(sum(col("sim9")).as("score9"))
      .join(train.select(col("u"), col("item").as("cand"), lit(1).as("seen")),
        Seq("u", "cand"), "left")
      .filter(col("seen").isNull)
    val top = cand
      .withColumn("rk", row_number().over(Window.partitionBy(col("u"))
        .orderBy(col("score9").desc, col("cand"))))
      .filter(col("rk") <= k)
    val evaluated = train.select(col("u")).distinct()
    val hits = test.join(
      top.select(col("u").as("tu"), col("cand")),
      col("u") === col("tu") && col("test_item") === col("cand"),
      "left_semi")
    evaluated.agg(count(lit(1)).as("n_users"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(col("n_users"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_users").cast("double"),
          9).as("hit_rate9"))
  }
}
