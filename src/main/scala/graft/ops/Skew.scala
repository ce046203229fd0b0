package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY scale notes; builder-prompt
  * "salting for skew"). AQE's skew-join splitting handles joins at
  * runtime; hot-key AGGREGATIONS are salted explicitly: a two-stage
  * aggregate where stage 1 fans each hot key out over `salts` random
  * partials and stage 2 merges them — the shuffle before stage 1 is
  * uniform even when one key holds most rows.
  *
  * Works for any algebraic aggregate (sum/count/min/max); pass the
  * partial and merge forms explicitly.
  */
object Skew {

  /** Salted two-stage aggregation.
    * @param partials stage-1 aggregates over (keys + salt)
    * @param merges   stage-2 merges of the partial columns */
  def saltedAgg(df: DataFrame, keys: Seq[Column], salts: Int,
                partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(!df.columns.contains("_salt"),
      "input must not already have a _salt column")
    df.withColumn("_salt", (rand(42L) * salts).cast("int"))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted count per key — count is algebraic: partial counts then a
    * sum merge. Result is identical to `groupBy(keys).count()`; the
    * plan shuffles `salts`× more keys but no single reducer sees a hot
    * key's full row set. */
  def saltedCount(df: DataFrame, keys: Seq[Column], salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      partials = Seq(count(lit(1)).as("_pc")),
      merges = Seq(sum(col("_pc")).as("cnt")))

  /** Salted sum of a scaled-long column (deterministic — long sums are
    * associative/commutative, so salting cannot change the result). */
  def saltedLongSum(df: DataFrame, keys: Seq[Column], value: Column,
                    salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      partials = Seq(sum(value).as("_ps")),
      merges = Seq(sum(col("_ps")).as("sum_value")))

  /** Salted equi join for a skewed big side against a small-but-not-
    * broadcastable dimension: the big side draws a random salt in
    * [0, salts), the small side is replicated once per salt value, and
    * the join key becomes (keys, salt) — a hot key's rows spread over
    * `salts` reducers instead of landing on one. Because every salt
    * bucket holds the full small side, the result equals the unsalted
    * join for ANY salt assignment (inner and left joins; q67 oracle
    * proves it). AQE's skew split does this at runtime from shuffle
    * statistics; the explicit form covers engines/paths without AQE or
    * skew known ahead of time. */
  def saltedJoin(big: DataFrame, small: DataFrame, on: Seq[String],
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer")(joinType),
      "saltedJoin preserves semantics for inner/left joins only")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not already have a _salt column")
    val b = big.withColumn("_salt", (rand(42L) * salts).cast("int"))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, on :+ "_salt", joinType).drop("_salt")
  }

  /** HYBRID skew join (PACT/Hive "skewjoin" lineage; the classic
    * frequency-partitioned hash join): route the HEAVY keys — those
    * holding ≥ `heavyThreshold` probe rows — through a broadcast hash
    * join, and everything else through the ordinary shuffle join, then
    * union. Where [[saltedJoin]] spreads a hot key over `salts`
    * reducers but still replicates the WHOLE small side `salts`×, the
    * hybrid moves only the heavy slice of the dimension driver-side:
    * at 100 TB a handful of mega-keys (the null-ish defaults, the bot
    * user, the top domain) dominate the shuffle; broadcasting just
    * their dimension rows removes them from the exchange entirely and
    * the residual shuffle is near-uniform.
    *
    * Plan shape: one partial-agg key-count shuffle over the big side
    * (map-side combined, output = distinct keys), a broadcast semi/
    * anti split of both inputs by heaviness (the heavy-key frame is
    * O(#heavy) by construction — that is the broadcast invariant), a
    * BroadcastHashJoin for the heavy slice and a shuffle join for the
    * light slice. Result ≡ plain inner join for ANY threshold (each
    * input row lands in exactly one slice; keys don't cross slices),
    * which is what the q208 oracle checks.
    *
    * @param heavyThreshold big-side row count at and above which a key
    *                       is routed to the broadcast path. */
  def hybridJoin(big: DataFrame, small: DataFrame, on: Seq[String],
                 heavyThreshold: Long): DataFrame = {
    require(heavyThreshold >= 1)
    val heavyKeys = big.groupBy(on.map(col): _*)
      .agg(count(lit(1)).as("_kc"))
      .filter(col("_kc") >= heavyThreshold)
      .select(on.map(col): _*)
    val heavy = big.join(broadcast(heavyKeys), on, "left_semi")
      .join(broadcast(small.join(broadcast(heavyKeys), on, "left_semi")), on)
    val light = big.join(broadcast(heavyKeys), on, "left_anti")
      .join(small, on)
    heavy.unionByName(light)
  }

  /** JOIN-KEY SKEW ADVISOR — the diagnostic that decides BETWEEN this
    * file's remedies: for each candidate key column, exact row count,
    * distinct keys, the heaviest key and its share. Verdict by share
    * of the hottest key: ≥ `saltShare` → salt ([[saltedJoin]]) —
    * one key floods a partition; ≥ `hybridShare` → hybrid
    * ([[hybridJoin]]) — a few heavy keys, broadcast just those;
    * else plain shuffle. One aggregate pass per column; the argmax
    * is a TakeOrdered(1) with a (cnt DESC, key ASC) tie-break.
    *
    * @return (table_name, column_name, n_rows, n_distinct, top_key,
    *         top_cnt, top_share9, verdict). */
  def skewAdvisor(df: DataFrame, table: String, cols: Seq[String],
                  saltShare: Double = 0.2, hybridShare: Double = 0.02)
      : DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.map { c =>
      val counts = df.groupBy(col(c).cast("string").as("k"))
        .agg(count(lit(1)).as("cnt"))
      val top = counts.orderBy(col("cnt").desc, col("k")).limit(1)
        .select(col("k").as("top_key"), col("cnt").as("top_cnt"))
      val tot = counts.agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_distinct"))
      tot.crossJoin(top)
        .select(lit(table).as("table_name"), lit(c).as("column_name"),
          col("n_rows"), col("n_distinct"), col("top_key"), col("top_cnt"),
          round(col("top_cnt").cast("double") / col("n_rows").cast("double"),
            9).as("top_share9"),
          when(col("top_cnt").cast("double") >=
              col("n_rows").cast("double") * saltShare, "salt")
            .when(col("top_cnt").cast("double") >=
              col("n_rows").cast("double") * hybridShare, "hybrid")
            .otherwise("plain").as("verdict"))
    }.reduce(_.unionByName(_))
  }

  /** RENDEZVOUS (highest-random-weight) HASHING shard assignment
    * (Thaler & Ravishankar 1998 — the consistent-placement scheme
    * behind cache rings and shard routers): key k goes to
    * argmax_{s ∈ shards} h(k, s) over the portable 60-bit md5. The
    * defining property — growing the fleet from N to N+1 shards moves
    * EXACTLY the keys whose new shard wins the argmax, an expected
    * 1/(N+1) of them, with no other reshuffling (modulo hashing moves
    * nearly everything) — is what this returns evidence for: the
    * assignment under both fleets plus the per-key moved flag.
    *
    * Shape: a narrow per-row argmax over `shards`+1 hash evaluations
    * (pure codegen expressions — no explode, no join, no shuffle);
    * the caller aggregates. Deterministic and engine-replayable:
    * argmax ties break to the LOWER shard id (h is 60-bit md5 over
    * distinct strings — ties are cosmically unlikely but pinned).
    *
    * @return df + (shard_old, shard_new, moved). */
  def rendezvousAssign(df: DataFrame, keyCol: Column, shards: Int)
      : DataFrame = {
    require(shards >= 1 && shards <= 64)
    // materialize each shard hash as a real column FIRST: a naive
    // when-chain fold over inline md5 subtrees nests the accumulator
    // twice per level (condition + otherwise), duplicating the digest
    // tree 2^N times — measured as a multi-second codegen stall.
    // Attribute references keep the argmax chain linear.
    val hCols = (0 to shards).map(s => s"_rv_h$s")
    val withH = hCols.zipWithIndex.foldLeft(df.withColumn("_rv_key", keyCol)) {
      case (acc, (c, s)) => acc.withColumn(c, expr(
        s"cast(conv(substring(md5(concat(cast(_rv_key as string), " +
          s"':', '$s')), 1, 15), 16, 10) as bigint)"))
    }
    def argmax(n: Int): Column =
      (0 until n).map(s => struct(col(hCols(s)).as("h"), lit(s).as("s")))
        .reduce((a, b) => when(b("h") > a("h"), b).otherwise(a))
        .getField("s")
    withH
      .withColumn("shard_old", argmax(shards).cast("int"))
      .withColumn("shard_new", argmax(shards + 1).cast("int"))
      .withColumn("moved", col("shard_old") =!= col("shard_new"))
      .drop("_rv_key" +: hCols: _*)
  }
}
