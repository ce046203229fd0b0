#!/usr/bin/env python3
"""Standing per-round scale artifact (round-5 verdict ask #6): run
graft.ScaleProbe on the 12-query scale subset at sf0.01 and at a
synthesized sf1 (10x sf0.1 by key-offset replication), compute the
100x per-query ratios, and write SCALE_r{N}.json next to the BENCH
artifacts so scale regressions diff across rounds.

Usage: tools/scale.py <round> [queryCsv]
"""
import json, subprocess, sys

QUERIES = ",".join([
    # environment CONTROL (round-9 verdict ask #3): a trivial fixed
    # filter-project whose cross-round drift isolates host speed from
    # plan regressions — read it first when comparing rounds
    "q02_filter_project",
    "q01_pricing_summary", "q04_nation_revenue", "q08_running_qty",
    "q26_dedup_minhash", "q52_dedup_groups", "q78_zorder",
    "q80_locf_resample", "q93_ann_distributed", "q105_pagerank",
    "q108_perplexity", "q110_feature_hash", "q111_e2e_rag",
    # round-6 join/sort-shaped additions: RRF (probe term ⋈ postings),
    # span dedup (span-hash shuffle + join-back), shard writer (global
    # range sort + zipWithIndex)
    "q123_hybrid_rrf", "q125_span_dedup", "q129_shard_assign",
    # late round-6: C4 keep-first (segment-text window shuffle) and
    # DSIR (token stream ⋈ broadcast bucket model + TakeOrdered cut)
    "q130_segment_dedup", "q132_dsir_select",
    # round-7 (verdict ask #3): event-family probes SCALE_r06 could not
    # cover while the events loader was broken — interval-overlap join
    # (grid-bucketed) and session-overlap triangle counting
    "q81_session_overlap", "q109_triangles",
    # round-8: IVF-PQ (bucket-pruned ADC joins), the all-but-the-top
    # residual (power-iteration collects + narrow transform), token
    # entropy ((doc,term) grid shuffle), vocab growth (term first-seen)
    "q143_ivf_pq", "q144_detop_residual", "q146_token_entropy",
    "q148_vocab_growth",
    # late round-7: association rules (session-keyed basket self-join),
    # rolling actives (explode-forward distinct), zone map (global
    # range sort + zipWithIndex), LPA (iterative BSP label joins)
    "q162_association_rules", "q166_rolling_active_users",
    "q167_zone_map", "q168_label_propagation",
    # round-7 batch-4: the prefix-filtered exact Jaccard join (its
    # whole claim is sub-quadratic growth vs the q27 all-pairs anchor,
    # which is 2x faster at toy scale — the ratio here is the proof),
    # the bucketed skyline, and the per-key EWMA window
    "q177_prefix_jaccard", "q174_pareto_front", "q178_ewma_smooth",
    # round-7 batch-5: star-contraction CC (vs q52's BSP on the same
    # pairs), hybrid heavy-key join, Kneser-Ney LM (3 agg shuffles),
    # exact bitmap distinct (partial-agg bitmaps), containment dedup
    # (directed shingle grid), HITS (2 iterations, 4 shuffles), and
    # grid-density clustering (one cell shuffle + bounded cell graph)
    "q207_cc_stars", "q208_hybrid_skew_join", "q210_kneser_ney",
    "q215_bitmap_distinct", "q216_containment_dedup", "q218_hits",
    "q221_grid_density",
    # round-7 batch-6: Naive Bayes (doc-term ⋈ V·L model join), the
    # cross-source shingle posting self-join, ACF (grid lag joins),
    # Poisson bootstrap (50x generated fan-out, map-side collapsed),
    # ahash banded image pairs, and the two-sided mutual-NN align
    "q226_naive_bayes", "q230_source_overlap", "q229_acf_hourly",
    "q235_poisson_bootstrap", "q240_image_neardup", "q243_mutual_nn_align",
    # classic TPC-H multi-way join + rollup shapes (Q3/Q5/Q10 adapted)
    "q250_tpch_q3", "q251_tpch_q5", "q252_tpch_q10",
    # round-8 (verdict ask #2): the 9 slowest bench rows that had no
    # 100x reading — iterative BSP graph loops (k-core, clustering
    # coefficient, LPA-adjacent), the stream-CDC upsert, the
    # correlation matrix, rec holdout, and the remaining driver-loop
    # shapes
    "q204_clustering_coef", "q197_kcore", "q225_correlation_matrix",
    "q206_rec_holdout", "q122_stream_cdc_upsert", "q139_dedup_canonical",
    "q200_theil_sen", "q205_textrank", "q187_greedy_coverage",
    # round-8 new shapes: IVF-bucketed mutual-NN (the q243 ratio fix),
    # the multi-semi/anti TPC-H Q21, the zero-Exchange bucketed join,
    # the banded portable SimHash pair join, and the JPEG decode
    # (narrow per-row kernel control)
    "q266_mutual_nn_ivf", "q272_tpch_q21", "q273_bucketed_join",
    "q29_simhash_pairs", "q267_jpeg_pixel_decode",
    # round-8 continuation: the fact-heaviest new TPC-H shapes (Q7
    # 6-way nation-pair join, Q18 group-HAVING semi, Q16
    # distinct-after-anti), the GIF LZW decode (narrow per-row kernel
    # control), the SNM window dedup (prefix-partitioned sort), and
    # conformal intervals (per-type rank windows)
    "q276_tpch_q7", "q282_tpch_q18", "q285_tpch_q16",
    "q288_gif_pixel_decode", "q296_sorted_neighborhood",
    "q295_conformal_interval",
    # round-8 continuation 2: the remaining TPC-H classics (Q2's
    # supply-agg + correlated min, Q15's scalar-max view), the
    # incremental delta-vs-corpus dedup (its WHOLE claim is O(delta) —
    # the ratio must track the delta, not the corpus pair grid), PMI
    # collocations (vocab-bounded output over corpus-sized counts),
    # modularity (LPA + two community joins), and LOO target encoding
    # (O(categories) broadcast back over the stream side)
    "q302_tpch_q2", "q303_tpch_q15", "q305_incremental_dedup",
    "q304_pmi_collocations", "q307_modularity", "q308_target_encoding",
    # late round-8: the custom DSv2 connector (write + pruned scan —
    # one partition per file, parallelism tracks the writer's
    # partitioning)
    "q312_custom_source",
    # round-9 continuation: the AVI/MJPEG container demux + per-frame
    # JPEG decode (narrow per-row kernel control, like q267/q288)
    "q315_video_frame_sample",
    # round-9 continuation 2: the unigram-LM tokenizer (substring-count
    # aggs + broadcast codebook + narrow Viterbi), URL canonicalization
    # (narrow codegen + canonical-key group), robots longest-match
    # (broadcast prefix join + per-URL argmax), Holt forecast (day agg
    # + per-key mapGroups recurrence), the grec aggregate pushdown
    # (per-file combine inside the source), and the ADPCM decode
    # (narrow per-row state-machine kernel control)
    "q324_unigram_lm_segment", "q326_url_canonicalize",
    "q328_robots_match", "q332_holt_forecast",
    "q329_grec_agg_pushdown", "q325_adpcm_decode",
    # round-9 continuation 3: link prediction (wedge self-join off the
    # bucketed artifact + pair agg + anti join — fan-out bounded by the
    # hub cap, the ratio must track capped wedges, not degree growth),
    # WordPiece (substring-count aggs + broadcast greedy — the q324
    # shape), Fellegi-Sunter (constant-size name-prefix blocks — pair
    # volume and the ratio grow LINEARLY; a growing ratio is a real
    # regression, not design), the lerp panel
    # (grid explode + one sort + two windows), the KMV sketch
    # (mergeable O(k) partials), and the HTML extractor (narrow
    # regexp kernel control)
    "q337_link_prediction", "q338_wordpiece_segment",
    "q343_fellegi_sunter", "q344_lerp_resample",
    "q340_kmv_distinct", "q341_html_extract",
    # round-9 continuation 4: KMV set algebra (one distinct scan +
    # three O(k) driver sketch collects) and WordPiece fertility
    # (the q338 chain + a broadcast join)
    "q349_kmv_set_algebra", "q350_wordpiece_fertility",
])

rnd = sys.argv[1]
queries = sys.argv[2] if len(sys.argv) > 2 else QUERIES

# The sf1 replica + its shuffle spill peak at tens of GB; stale copies
# from a previous (or killed) run have exhausted /tmp before — a probe
# died ENOSPC mid-build. Clear our own replica dirs and any orphaned
# Spark block-manager spill (no JVM alive to own it) before starting.
import shutil, glob as _glob
no_jvm = subprocess.run(["pgrep", "java"], capture_output=True).returncode != 0
for p in ["/tmp/scale_sf001", "/tmp/scale_sf1"]:
    shutil.rmtree(p, ignore_errors=True)
if no_jvm:
    for p in _glob.glob("/tmp/blockmgr-*") + _glob.glob("/tmp/spark-*"):
        shutil.rmtree(p, ignore_errors=True)


import os

def probe_chunk(src, out, copies, qcsv):
    env = {**os.environ, "SPARK_DRIVER_MEM": "16g"}
    r = subprocess.run(
        ["sbt", f"runMain graft.ScaleProbe {src} {out} {copies} {qcsv}"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    lines = [l for l in r.stdout.splitlines() if '"metric":"scaleprobe"' in l]
    if not lines:
        sys.stderr.write(r.stdout[-3000:] + "\n" + r.stderr[-2000:])
        sys.exit(1)
    return json.loads(lines[-1][lines[-1].index("{"):])


def probe(src, out, copies):
    # One 50+-query pass in a single JVM accumulates per-query caches
    # (memoized pair lists, loop state, bucket layouts) past the probe
    # heap — observed as a cumulative OOM at sf1 when the round-8 set
    # grew to 51. Chunked invocations keep each JVM's resident set to
    # its own ~20 queries; timings are per-query min-of-two either way.
    names = queries.split(",")
    merged = None
    for i in range(0, len(names), 20):
        part = probe_chunk(src, out, copies, ",".join(names[i:i + 20]))
        if merged is None:
            merged = part
        else:
            merged["queries"].update(part["queries"])
    return merged


small = probe("/root/testdata/sf0.01", "/tmp/scale_sf001", 1)
big = probe("/root/testdata/sf0.1", "/tmp/scale_sf1", 10)
ratios = {q: round(big["queries"][q] / max(small["queries"][q], 1e-9), 2)
          for q in big["queries"]}
artifact = {
    "metric": "scale_100x",
    "round": int(rnd),
    "sf_small": "sf0.01", "sf_big": "sf1 (10x sf0.1 key-offset replication)",
    "discipline": "min-of-two passes per query, GC settle between, "
                  "caches cleared between passes; replica documents carry "
                  "~25% token-level noise per copy (cross-copy Jaccard ~0.4, "
                  "not the pre-round-9 suffix-only Jaccard-1 cliques)",
    "control_q02_ratio": ratios.get("q02_filter_project"),
    "control_q02_sec": {
        "small": small["queries"].get("q02_filter_project"),
        "big": big["queries"].get("q02_filter_project"),
    },
    "seconds_small": {k: round(v, 3) for k, v in small["queries"].items()},
    "seconds_big": {k: round(v, 3) for k, v in big["queries"].items()},
    "ratio_100x": ratios,
    "median_ratio": sorted(ratios.values())[len(ratios) // 2],
}
path = f"/root/repo/SCALE_r{int(rnd):02d}.json"
with open(path, "w") as f:
    json.dump(artifact, f, indent=1, sort_keys=True)
print(json.dumps(artifact["ratio_100x"], sort_keys=True))
print(f"wrote {path}; median {artifact['median_ratio']}")
