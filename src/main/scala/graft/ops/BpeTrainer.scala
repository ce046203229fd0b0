package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE TRAINING over a distributed corpus — learn the merge table that
  * [[graft.functions.BpeTokenCount]] then applies. The naive
  * re-encode trainer (Sennrich et al. '16 Algorithm 1): each round
  * re-encodes every word under the merges learned so far, counts
  * adjacent token pairs corpus-wide, and adopts the most frequent pair
  * (ties broken lexicographically, so training is deterministic on any
  * partitioning — pair counts are exact long sums).
  *
  * Scale shape per round: one narrow re-encode (the codegen'd
  * [[graft.functions.BpeTokens]] kernel — the merge table rides along
  * as a reference object), one pair-count shuffle, one O(1) argmax to
  * the driver (`orderBy(...).limit(1)` plans as
  * TakeOrderedAndProject — per-partition heaps, never a global sort).
  * The tokenized word list is cached once across rounds (production
  * trainers also keep the word histogram, not raw text). k rounds ⇒
  * k shuffles + k scalar actions — the same iterative contract as
  * K-Means/PageRank, with O(k) driver state (the merge list itself).
  */
object BpeTrainer {

  /** Learn up to `k` merges from the corpus' whitespace words.
    * Stops early when no adjacent pair repeats. */
  def learnMerges(df: DataFrame, textCol: String, k: Int): Seq[(String, String)] = {
    require(k >= 0)
    val words = df.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
      .cache()
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.length < k && !done) {
      val toks = words
        .select(graft.functions.BpeFunctions.bpeTokens(col("word"), merges).as("t"))
        .where(size(col("t")) >= 2)
      val best = toks
        .select(explode(expr("sequence(1, size(t) - 1)")).as("i"), col("t"))
        .select(element_at(col("t"), col("i")).as("a"),
          element_at(col("t"), col("i") + 1).as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else merges = merges :+ ((best(0).getString(0), best(0).getString(1)))
    }
    words.unpersist(blocking = false)
    merges
  }

  /** INCREMENTAL trainer — same merges as [[learnMerges]] (BpeSpec /
    * BpeTrainerSpec equate them), with per-round cost that SHRINKS as
    * training progresses instead of growing:
    *
    *  - The corpus collapses once to a WORD HISTOGRAM (word, freq) —
    *    pair statistics then scale with distinct words, not corpus
    *    size, and every count is Σ freq (exact long, identical to the
    *    naive trainer's per-occurrence count).
    *  - Token arrays are materialized and each adopted merge is applied
    *    ONCE ([[graft.functions.BpeImpl.mergeAdjacent]], O(len)) —
    *    never the O(len·|merges|) full re-encode per round.
    *  - Pair counts are maintained by DELTA: only words the merge
    *    actually changed contribute (old pairs at −freq, new at +freq),
    *    merged into the standing count table by one full-outer join.
    *    Late rounds touch few words, so per-round cost decays — the
    *    superlinear win over k full re-encode passes.
    *
    * Scale: state = two cached DataFrames (histogram-sized); per round
    * one narrow merge-apply map, one delta shuffle over CHANGED words'
    * pairs, one O(1) argmax. Caches rotate per round (BSP hygiene,
    * same pattern as connected components). */
  def learnMergesIncremental(df: DataFrame, textCol: String, k: Int): Seq[(String, String)] = {
    require(k >= 0)
    import graft.functions.BpeFunctions
    def pairsOf(words: DataFrame, toksCol: String, sign: Int): DataFrame = words
      .where(size(col(toksCol)) >= 2)
      .select(explode(expr(s"sequence(1, size($toksCol) - 1)")).as("i"),
        col(toksCol).as("t"), col("freq"))
      .select(element_at(col("t"), col("i")).as("a"),
        element_at(col("t"), col("i") + 1).as("b"),
        (col("freq") * sign).as("freq"))
    var words = df.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(BpeFunctions.bpeTokens(col("word"), Nil).as("toks"), col("freq"))
      .cache()
    var counts = pairsOf(words, "toks", 1)
      .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("cnt"))
      .cache()
    // ONE action per round: the argmax collect materializes this
    // round's (lazily cached) counts — and, through the delta lineage,
    // the words cache — so the previous round's caches are dropped
    // AFTER the collect, one round deferred. The naive trainer also
    // pays one action per round, so all of the incremental win is
    // compute, none of it is eaten by extra materialization passes.
    var prevWords: DataFrame = null
    var prevCounts: DataFrame = null
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.length < k && !done) {
      val best = counts.where(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (prevWords != null) {
        prevWords.unpersist(blocking = false); prevWords = null
        prevCounts.unpersist(blocking = false); prevCounts = null
      }
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges = merges :+ ((a, b))
        val applied = words
          .withColumn("nt", BpeFunctions.mergeAdjacent(col("toks"), a, b))
        // merge changed the array iff it got shorter; recomputed per
        // delta branch from the materialized words cache (narrow)
        val changed = applied.filter(size(col("nt")) < size(col("toks")))
        val delta = pairsOf(changed, "toks", -1)
          .unionByName(pairsOf(changed, "nt", 1))
          .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("d"))
        val newCounts = counts.join(delta, Seq("a", "b"), "full_outer")
          .select(col("a"), col("b"),
            (coalesce(col("cnt"), lit(0L)) + coalesce(col("d"), lit(0L))).as("cnt"))
          .filter(col("cnt") > 0)
          .cache()
        val newWords = applied.select(col("nt").as("toks"), col("freq")).cache()
        prevWords = words; prevCounts = counts
        counts = newCounts
        words = newWords
      }
    }
    Seq(words, counts, prevWords, prevCounts).filter(_ != null)
      .foreach(_.unpersist(blocking = false))
    merges
  }
}
