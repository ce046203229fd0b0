package graft

import org.scalatest.funsuite.AnyFunSuite

/** Automated plan audit over every declared query — locks in the
  * scale-shape claims permanently: no quadratic join operator sneaks
  * into a declared scale path, parquet scans keep their pushed
  * filters, dimension joins broadcast.
  *
  * Exact all-pairs baselines are quadratic BY DESIGN (kept as the
  * oracle-checkable semantic anchors for their approximate scale
  * paths) and are the only allowlisted entries:
  *  - q30 embed near-dup (scale path: q32 LSH / q47 IVF)
  *  - q31 brute-force ANN (scale path: q47 IVF)
  *  - q92 planes=0 LSH anchor: the constant bucket key constant-folds
  *    the equi-join into a nested-loop — which is exactly the point
  *    (candidate set = all pairs ⇒ provably ≡ exact q30); q32 is the
  *    production configuration of the same code path and stays linted
  */
class PlanLintSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val quadraticByDesign =
    Set("q30_embed_neardup", "q31_ann_topk", "q92_ann_lsh_full",
      // the threshold-tuning histogram runs on the exact q27 pair
      // grid by declaration (sample-scale audit)
      "q300_dedup_sim_histogram",
      // recall audit: the TRUTH side is the exact all-pairs grid by
      // declaration (hash-sampled at scale); the found side is the
      // linted q32 bucket join
      "q306_ann_recall")

  // Broadcast k-query probe scans: stream side = corpus, broadcast
  // side = O(1) query rows, so the nested-loop operator is one kernel
  // evaluation per corpus row — LINEAR in the corpus, not a pair
  // explosion. Allowlisted separately from the true quadratics.
  private val broadcastProbeScan = Set("q112_ann_quantized_rerank",
    "q123_hybrid_rrf", "q126_hard_negatives",
    // both mutual-NN directions run the documented broadcast-probe
    // bruteForceTopK (≤250-row probe side; IVF-bucket at web scale)
    "q243_mutual_nn_align",
    // label-noise kNN: 200-row probe side through the same kernel
    "q298_label_noise_knn")

  // Scalar-aggregate broadcasts: a crossJoin whose build side is a
  // ONE-ROW aggregate (global min/max, corpus total, quantile
  // boundaries, session count) folded into every row of the stream
  // side — the scalar-subquery shape. The nested-loop operator runs
  // exactly once per stream row against a single build row: linear,
  // and the 1-row side is guaranteed by the aggregation itself.
  private val scalarBroadcast = Set("q156_kl_divergence",
    "q160_value_histogram", "q162_association_rules",
    "q164_length_curriculum", "q166_rolling_active_users",
    "q172_decision_stump", "q184_calibration", "q192_join_cardinality",
    "q203_kaplan_meier", "q206_rec_holdout",
    // same shape, round-7 additions: vocab-size/corpus-total/class
    // table (O(#classes) rows) in Naive Bayes, the dictionary max-id
    // row, the global-mean row for LOO influence, the per-column
    // total×top rows of the skew advisor, the overall-trend row of
    // the Simpson check
    "q226_naive_bayes", "q234_dictionary_delta", "q242_source_influence",
    "q254_skew_advisor", "q260_simpson_check",
    // round-8 TPC-H shapes: Q11's global-total row and Q22's global
    // positive-balance average row — the textbook scalar subqueries
    "q279_tpch_q11", "q284_tpch_q22",
    // kappa: two one-row aggregates (agree/N and Σ row·col) attach
    "q290_cohens_kappa",
    // IPS: the global-N row attaches to the O(#actions) group table
    "q294_offpolicy_ips",
    // PMI: the (n_uni, n_bi) 1-row totals attach to the O(vocab²)
    // bigram table
    "q304_pmi_collocations",
    // modularity: the 1-row edge-count m attaches to the O(#communities)
    // table
    "q307_modularity",
    // round-9 continuation: alpha's 1-row (do_k, marginals) pair,
    // CUPED's 1-row pooled moments attaching to the 2-row arm table
    // (Fellegi–Sunter needs no entry: its totals collect as an O(1)
    // model and the weights are literals)
    "q342_krippendorff_alpha", "q348_cuped",
    // round-10: q354's three 1-row volume aggregates combine by
    // crossJoin; q355's 1-row octile-boundary array attaches to the
    // length stream — both the textbook scalar-subquery shape
    "q354_containment_candidates", "q355_length_buckets",
    // round-12: TfIdf.idf's corpus-size N now attaches as a 1-row
    // broadcast (was a BLOCKING driver-side distinct().count() that
    // serialized every docVectors build) — every TF-IDF consumer
    // inherits the scalar-subquery shape
    "q14_idf", "q15_tfidf", "q16_lang_term_mean",
    "q17_top_terms_per_lang", "q19_doc_vector_strings",
    "q24_kmeans_parallel")

  // Bounded-cell DP / generator fan-outs: every nested-loop input here
  // is a CELL TABLE whose size is a fixed parameter, not data volume —
  // the 24-row lag generator against the hourly grid (q229), interval
  // minimax over ≤10 calibration bins (q232), and the min-plus DP over
  // ≤64 pre-bins (q256). Work is cells², constant at any SF; the one
  // full-data pass in each query is the partial-agg that BUILDS the
  // cell table.
  private val boundedCellDp = Set("q229_acf_hourly",
    "q232_isotonic_calibration", "q256_voptimal_histogram")

  test("no cartesian/nested-loop join in any non-baseline query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) =>
        quadraticByDesign(name) || broadcastProbeScan(name) ||
          scalarBroadcast(name) || boundedCellDp(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, TestSession.sf).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(",")}")
      }
    assert(offenders.isEmpty, s"quadratic operators in: ${offenders.mkString("; ")}")
  }

  test("filters reach the parquet scan (pushdown) on filter-heavy queries") {
    // q02 filters lineitem on shipdate/discount/quantity — every
    // conjunct is a plain column predicate and must appear in
    // PushedFilters, not as a post-scan-only Filter
    val plan = SparkEntry.queries("q02_filter_project")(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    // the plan string truncates long field lists, so just require a
    // non-empty PushedFilters list (an empty one prints as `[]`)
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"), plan)
  }

  test("dimension joins broadcast (no shuffle of the fact side's join)") {
    // q04 joins fact tables against nation/region-sized dims — the
    // plan must contain a broadcast join, not only sort-merge
    val plan = SparkEntry.queries("q04_nation_revenue")(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("aggregations combine map-side (partial + final, never final-only)") {
    // q01's sums/avgs must pre-aggregate before the shuffle — at
    // 100 TB the difference between shuffling 6 rows per partition
    // and 6 billion
    val plan = SparkEntry.queries("q01_pricing_summary")(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan)
  }

  test("global top-k plans as TakeOrderedAndProject, not a total sort") {
    // q05's LIMIT k over an ordering must keep per-partition heaps —
    // a full range-partitioned sort of the fact table would be the
    // classic 100 TB scale-killer for a top-k
    val plan = SparkEntry.queries("q05_top_parts")(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("chunking is shuffle-free: q99's only exchange is the output sort") {
    // the zero-shuffle claim for the RAG chunker — the transform +
    // posexplode pipeline straight from the scan; the single range
    // exchange is the deterministic ORDER BY the oracle compare needs,
    // not part of the operator
    val plan = SparkEntry.queries("q99_chunk_docs")(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange (\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.forall(_ == "rangepartitioning"),
      s"non-sort exchange in chunk plan: $exchanges\n$plan")
  }
}
