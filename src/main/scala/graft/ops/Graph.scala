package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over an edge DataFrame.
  *
  * Complements the min-label-propagation connected components in
  * [[Dedup.dedupGroups]] with the other canonical iterative graph
  * kernel a data-curation cluster runs: PageRank over a link/citation
  * graph (host ranking for crawl prioritization, document authority
  * for quality weighting).
  *
  * The twist that makes it cross-engine checkable: all arithmetic is
  * scaled-long INTEGER math (ranks in parts-per-`scale`), so every
  * partial sum is exact and order-independent — the result is
  * invariant to partitioning, AQE re-planning, and skew splitting,
  * and a SQL engine computing the same unrolled recurrence matches
  * bit-for-bit. Float PageRank cannot promise any of that.
  *
  * Scale design (100 TB edge list):
  *  - each iteration is ONE shuffle join (ranks ⋈ edges on src) plus
  *    one key shuffle for the per-dst sum — the textbook distributed
  *    PageRank plan (what GraphX/Pregel compile to);
  *  - the two scalars an iteration needs (node count, dangling mass)
  *    are O(1)-row driver aggregates injected as literals — the same
  *    "a literal beats a nested-loop scalar join" pattern as
  *    [[TextAnalysis.coOccurrencePmi]]/TfIdf.idf; never a collect of
  *    data rows;
  *  - each iteration's rank table is cached and the previous one
  *    unpersisted once superseded (the [[Dedup.dedupGroups]] BSP
  *    hygiene), truncating lineage so iteration i+1 never recomputes
  *    iteration i; the final table is reclaimed by
  *    [[graft.util.Caches.clearAll]]. On a real cluster a long run
  *    would checkpoint every ~10 rounds — with 3 unrolled rounds the
  *    cache suffices;
  *  - dangling-node mass is redistributed uniformly, so total rank
  *    mass is conserved up to integer-division remainders.
  */
object Graph {

  /** Exact integer PageRank.
    *
    * Recurrence (all ops on non-negative longs, `div` = truncating
    * division; every node starts at `scale div n`):
    * {{{
    *   base       = ((100 - damp) * scale div 100) div n
    *   contrib(v) = Σ_{(u,v) ∈ E} rank(u) div outdeg(u)
    *   dangling   = Σ_{outdeg(u) = 0} rank(u)
    *   rank'(v)   = base + damp * (contrib(v) + dangling div n) div 100
    * }}}
    *
    * @param edges directed edges; must have `src` and `dst` columns
    *              (any integral type). Duplicates are collapsed.
    * @param iters number of iterations.
    * @param scale rank mass unit — results are parts-per-`scale`.
    * @param damp  damping factor in percent (classic 85 = 0.85).
    * @return (node LONG, rank LONG) — one row per distinct node.
    */
  def pageRankExact(edges: DataFrame, iters: Int,
                    scale: Long = 1000000000000L, damp: Int = 85): DataFrame = {
    require(iters >= 1 && damp >= 0 && damp <= 100)
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct().cache()
    val deg = e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
      .distinct()
      .join(e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg")),
        Seq("node"), "left")
      .na.fill(0L, Seq("outdeg"))
      .cache()
    val n = deg.count()
    val base = ((100 - damp).toLong * scale / 100) / n

    var ranks = deg.withColumn("rank", lit(scale / n))
    var persisted: DataFrame = null
    for (_ <- 1 to iters) {
      val cur = ranks.cache()
      // O(1) scalar per round (this action also materializes `cur`,
      // so the next round reads the cache, not the lineage)
      val dangShare = cur.where(col("outdeg") === 0)
        .agg(coalesce(sum(col("rank")), lit(0L))).first().getLong(0) / n
      if (persisted != null) persisted.unpersist(blocking = false)
      persisted = cur
      val contrib = e.join(cur, e("src") === cur("node"))
        .groupBy(col("dst").as("cnode"))
        .agg(sum(expr("rank div outdeg")).as("contrib"))
      ranks = deg.join(contrib, deg("node") === contrib("cnode"), "left")
        .select(col("node"), col("outdeg"),
          expr(s"${base}L + ($damp * (coalesce(contrib, 0L) + ${dangShare}L)) div 100")
            .as("rank"))
    }
    ranks.select(col("node"), col("rank"))
  }
}
