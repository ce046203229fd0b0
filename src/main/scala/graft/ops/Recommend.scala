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
    // the pair stage at cap² rows per user
    val kept = inter.join(
      inter.groupBy(col("u")).agg(count(lit(1)).as("nu"))
        .filter(col("nu") <= maxUserItems).select(col("u")),
      Seq("u"))
    val deg = kept.groupBy(col("item")).agg(count(lit(1)).as("deg"))
    val co = kept.as("a")
      .join(kept.as("b"), col("a.u") === col("b.u")
        && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("co"))
    val sym = co.select(col("ia").as("item"), col("ib").as("neighbor"),
        col("co"))
      .unionAll(co.select(col("ib").as("item"), col("ia").as("neighbor"),
        col("co")))
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
}
