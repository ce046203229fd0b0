package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Multinomial NAIVE BAYES text classification — train and apply in
  * one declarative plan. The workhorse baseline for corpus labeling
  * (language, domain, quality tier) before anything neural touches the
  * data: exact count statistics, Laplace-smoothed token likelihoods,
  * argmax of summed log-probabilities (McCallum & Nigam 1998's
  * multinomial event model). The reference pipeline's dictionary +
  * frequency machinery (SURVEY §2.3-§2.4) is exactly the training
  * half; this closes the loop with the scoring half.
  *
  * Determinism: every ln is rounded to 9 decimals and scaled to an
  * exact long BEFORE summation (the [[TextAnalysis.tokenEntropy]]
  * discipline), so per-document scores are integer sums — stable
  * under any partitioning and bit-equal across engines. The argmax
  * tie-break is (score DESC, class ASC).
  *
  * Scale: one tokenize-explode shuffle produces BOTH count tables
  * ((doc,term) and (class,term)); the class table (priors, totals,
  * vocab size) is broadcast-sized; scoring joins the doc-term
  * partials to the model on `term` (model rows ≤ V·L — distributed,
  * never driver-side) with map-side partial aggregation collapsing to
  * docs×L rows before the per-doc argmax window. Unseen-token mass is
  * algebra, not a join: score = prior + Σ_seen cnt·logp +
  * (T_doc − seen_cnt)·log p₀(class).
  */
object NaiveBayes {

  private def toks(textCol: Column): Column = split(textCol, "\\s+")

  /** round-9 natural log, scaled to an exact long (×1e9). */
  private def ln9(x: Column): Column =
    graft.util.Exact.scaled(round(log(x), 9), 9)

  /** Self-classification of a labeled corpus (train on all, score
    * all — the standard fit-diagnostic run; resubstitution accuracy
    * falls out of the `correct` column).
    *
    * PRECONDITION: `idCol` must be unique per document (one row, one
    * class, per id). `lt` folds the (class, term) counts FROM the
    * per-doc counts through a join on id — a duplicated id (or one id
    * under two classes) would multiply counts through that join where
    * the older per-token-row shape counted each token row once.
    *
    * @return (idCol, cls, pred, score9, correct) — one row per doc;
    *         `cls` is the true label, `score9` the winning class's
    *         scaled log-posterior, `correct` ∈ {0,1}. */
  def classify(df: DataFrame, idCol: String, textCol: String,
               classCol: String): DataFrame = {
    // ONE tokenize pass (round-11, guide §2): dt is the only consumer
    // of the exploded token stream; lt folds FROM dt (Σ per-doc counts
    // grouped by the doc's class ≡ the direct (class, term) count —
    // identical integers, one explode instead of two). The eager
    // snapshot stops dt's tokenize+agg subtree replaying in its three
    // consumers (docTot, seen, lt); values are unchanged. Round-12:
    // staged (lineage-retaining) — both tables are O(nnz)-scale.
    val tok = df.select(col(idCol).as("id"),
      explode(toks(col(textCol))).as("term"))
    val dt = graft.util.Snapshots.stage(
      tok.groupBy(col("id"), col("term"))
        .agg(count(lit(1)).as("cnt")))
    val docTot = dt.groupBy(col("id")).agg(sum(col("cnt")).as("t_d"))
    val docCls = df.select(col(idCol).as("id"), col(classCol).as("cls"))
    val lt = graft.util.Snapshots.stage(dt.join(docCls, Seq("id"))
      .groupBy(col("cls"), col("term"))
      .agg(sum(col("cnt")).as("c")))
    val nl = lt.groupBy(col("cls")).agg(sum(col("c")).as("n"))
    val vocab = lt.select(col("term")).distinct()
      .agg(count(lit(1)).as("v"))
    val dl = df.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("dn"))
    val dAll = df.agg(count(lit(1)).as("d_all"))
    // one row per class: token total, vocab size, log-prior, and the
    // unseen-token log-likelihood ln(1/(n+V))
    val classTbl = nl.join(dl, Seq("cls"))
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(dAll))
      .select(col("cls"), col("n"), col("v"),
        ln9(col("dn").cast("double") / col("d_all").cast("double"))
          .as("prior9"),
        ln9(lit(1).cast("double") / (col("n") + col("v")).cast("double"))
          .as("log09"))
    // Laplace-smoothed per-(class, term) log-likelihood
    val model = lt
      .join(broadcast(classTbl.select(col("cls"), col("n"), col("v"))),
        Seq("cls"))
      .select(col("cls"), col("term"),
        ln9((col("c") + 1).cast("double") /
          (col("n") + col("v")).cast("double")).as("logp9"))
    val seen = dt.join(model, Seq("term"))
      .groupBy(col("id"), col("cls"))
      .agg(sum(col("cnt") * col("logp9")).as("seen9"),
        sum(col("cnt")).as("seencnt"))
    val base = docTot.crossJoin(
      broadcast(classTbl.select(col("cls"), col("prior9"), col("log09"))))
    val scored = base.join(seen, Seq("id", "cls"), "left")
      .select(col("id"), col("cls"),
        (col("prior9") + coalesce(col("seen9"), lit(0L)) +
          (col("t_d") - coalesce(col("seencnt"), lit(0L))) * col("log09"))
          .as("score9"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score9").desc, col("cls"))
    val best = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id"), col("cls").as("pred"), col("score9"))
    df.select(col(idCol).as("id"), col(classCol).as("cls"))
      .join(best, Seq("id"))
      .select(col("id").as(idCol), col("cls"), col("pred"), col("score9"),
        when(col("cls") === col("pred"), 1L).otherwise(0L).as("correct"))
  }
}
