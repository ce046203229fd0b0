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
}
