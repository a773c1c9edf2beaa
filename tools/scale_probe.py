"""One-off scale empiricism (VERDICT r3 next-round #6): measure how the
most expensive bench queries scale from sf0.1 to a 10x replica.

No sf1.0 fixture exists, so this builds one in /tmp by unioning K
shifted copies of the sf0.1 tables (id columns offset by 1e9 per copy
so keys stay unique and FK joins keep their hit rates; dimension
tables region/nation/supplier/part are kept as-is — scale-up grows
facts, not dims). Content columns are left untouched, which makes the
dedup corpus K exact copies of every document — noted in BASELINE.md
where the numbers are recorded (candidate buckets get denser than an
organic corpus; the MAX_BUCKET cap is exactly the mechanism that
bounds that, so it is a fair stress).

Usage: python tools/scale_probe.py [K] [q_a,q_b,...]   (default K=10,
all PROBE queries; the optional second arg restricts to a subset so a
long probe can resume after an interruption — the replica dir is
reused when it already exists)
Prints one JSON line with per-query sf0.1 vs K-scaled timings and the
observed scaling exponent log(t_K/t_1)/log(K).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = f"/tmp/smr_scaled_sf0.1x{K}"
OFF = 1_000_000_000

# id columns to shift per copy (FKs shifted consistently with their PKs)
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
}
COPY = ["region", "nation", "supplier", "part"]

# The 5 most expensive steady-state queries per BENCH_r03 plan audit,
# plus round-4 representatives of the extended bench families (BM25
# lexical scoring, sketch-then-verify heavy hitters, hard-negative
# mining, curation funnel) so the scale claim covers the post-r1
# catalog, not just the legacy headline set.
PROBE = [
    "q_dedup_minhash_lsh",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q3_shipping_priority",
    "q_window_moving_avg",
    "q_text_bm25",
    "q_heavy_hitters",
    "q_sim_hard_negatives",
    "q_pipeline_curation_funnel",
    # Round-4 resumed-session additions: the fuzzy decontam shares the
    # MinHash index (its scaling shows the broadcast eval-side join
    # stays corpus-linear), the drawdown is the calendar-bounded
    # two-window shape, and common-neighbors is the wedge join whose
    # degree-bounding is the scale claim under test.
    "q_decontam_minhash",
    "q_ts_drawdown",
    "q_graph_common_neighbors",
    # Round-5 additions: BPE training scales with the VOCABULARY, not
    # the corpus (the scale claim under test); block dedup is payload-
    # proportional explode + checksum agg; LPA/k-core are the
    # checkpointed per-round |E|-joins; ivf-kmeans exercises the
    # trained-centroid memo (first run trains, steady state serves);
    # the incremental IVF assigns only the delta batch.
    "q_text_bpe_train_merges",
    "q_text_bpe_compression",
    "q_text_classifier_linear",
    "q_multimodal_block_dedup",
    "q_graph_label_propagation",
    "q_graph_kcore",
    "q_sim_ivf_incremental",
    "q_sim_ivf_kmeans_topk",
    "q_udtf_table_partition_by",
    # Late round-5: margin mining (A x B pair scoring + two K-NN
    # windows), phrase search (term-filtered position join), KN
    # smoothing (three bigram-grain aggs), the IVF recall curve (one
    # scored pass x |nprobes| filters + exact GT), Theil-Sen (pair set
    # quadratic in GROUPS, constant in rows), and the Poisson
    # bootstrap (B/4 digests per row, B-row agg state).
    "q_sim_margin_mining",
    # Round-10 optimization-round additions: every operator whose plan
    # changed this round gets a probe slot so the exponent record
    # covers the optimized shapes (cogroup bucket-grain, range-frame
    # tie counts, parallelized expansions, adaptive stream drain).
    "q_cogroup_reconcile",
    "q_sim_mmr_rerank",
    "q_approx_count_distinct",
    "q_stream_sessionize_stateful",
    "q_agg_weighted_median",
    "q_agg_trimmed_mean",
    "q_events_gini",
    "q_text_perplexity_buckets",
    "q_text_heaps_law",
    "q_grouping_sets",
    "q_jackknife_ratio_se",
    "q_rank_corr_spearman",
    "q_scalar_try",
    "q_stream_tumbling",
    "q_text_phrase_search",
    "q_text_kneser_ney",
    "q_sim_recall_curve",
    "q_trend_theil_sen",
    "q_bootstrap_poisson_se",
    # Round-6 (VERDICT r5 #5): one representative each from the five
    # never-probed families — rolling correlation (two nested range
    # frames), Markov stationary distribution (unrolled power iteration
    # over the transition matrix), bitmap distinct-count aggregation,
    # snapshot diff (full-outer join of two corpus snapshots), and the
    # lateral per-group top-n.
    "q_window_rolling_corr",
    "q_markov_stationary",
    "q_agg_bitmap_distinct",
    "q_snapshot_diff",
    "q_join_lateral_topn",
    # Round-6 second wave: the most expensive round-6 driver-window
    # entries (q20's nested per-group share threshold, the cluster-
    # aware split's connected components, dedup apply's anti-join) and
    # representatives of the still-never-probed modules (correlated
    # subquery, bucketed co-located join, SCD2 merge).
    "q20_excess_share_suppliers",
    "q_split_cluster_aware",
    "q_dedup_apply",
    "q_subquery_correlated",
    "q_join_bucketed",
    "q_merge_scd2",
    # Round-6 third wave: the pairwise dedup variants whose candidate
    # bounding was argued but never measured (simhash sign-bit
    # blocking, PPJoin prefix filter, keep-best cluster pick), plus
    # window-6 representatives of quality/curation (CDC apply's
    # ordered change replay, full-scan column profiling, preference-
    # pair construction).
    "q_dedup_simhash_pairs",
    "q_dedup_jaccard_prefix_filter",
    "q_dedup_keep_best",
    "q_cdc_apply",
    "q_profile_columns",
    "q_preference_pairs",
    # Round-6 fourth wave: the last modules with no probe row — exact
    # interpolated percentile (full sort-within-group), the pandas
    # UDAF surface (Arrow round-trip cost vs data growth), the two
    # MapReduce-compat reducers (holistic per-key contract), the
    # count-min sketch, and the dynamic-partition-pruning join.
    "q_agg_percentile_cont",
    "q_pandas_udaf_weighted_mean",
    "q_mr_compat_inverted_index",
    "mr_secondary_sort",
    "q_sketch_count_min",
    "q_join_dpp",
    # Round-7 (VERDICT r6 #7): the remaining output-bound candidates
    # get --rows runs at K=100 so every near-linear exponent in
    # BASELINE.md carries its output-growth denominator. EXCEPT ALL
    # multiset difference is row-for-row output-bound by construction;
    # snapshot diff's changed-row output grows with the fact tables;
    # simhash pairs' answer grows quadratically on the exact-copy
    # replica while its sign-bit blocking keeps candidate work flat.
    "q_set_except_all",
]


def build_scaled(spark) -> None:
    if os.path.isdir(DST) and os.path.isfile(f"{DST}/.complete"):
        print(f"reusing existing replica {DST}", file=sys.stderr)
        return
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    from pyspark.sql import functions as F

    for t in COPY:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t, keys in SHIFT.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(K):
            df = base
            for kcol in keys:
                df = df.withColumn(kcol, F.col(kcol) + F.lit(i * OFF))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # one flat dir of parquet part files; load_table reads dirs too
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    open(f"{DST}/.complete", "w").write("ok")


def time_query(fn, spark, sf_dir: str, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from simplemapreduce_spark import catalog
    from simplemapreduce_spark.cache import clear_memo
    from simplemapreduce_spark.session import get_spark

    catalog.load_all()
    spark = get_spark("scale-probe")
    print(f"building {K}x replica at {DST} ...", file=sys.stderr)
    t0 = time.perf_counter()
    build_scaled(spark)
    print(f"built in {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    pos = [a for a in sys.argv[2:] if not a.startswith("--")]
    only = pos[0].split(",") if pos else None
    if only:
        unknown = sorted(set(only) - set(PROBE))
        if unknown:
            raise SystemExit(f"not in PROBE: {unknown}")
    results = {}
    for name in PROBE:
        if only and name not in only:
            continue
        fn = catalog.QUERIES[name]
        # warm both plans once, then best-of-3 each (JIT already tiered
        # by the warmups at the small SF)
        fn(spark, SRC).write.format("noop").mode("overwrite").save()
        t1 = time_query(fn, spark, SRC)
        clear_memo()
        fn(spark, DST).write.format("noop").mode("overwrite").save()
        tk = time_query(fn, spark, DST)
        clear_memo()
        exp = math.log(tk / t1) / math.log(K)
        results[name] = {
            "sf0.1_sec": round(t1, 3),
            f"x{K}_sec": round(tk, 3),
            "scaling_exponent": round(exp, 3),
        }
        if "--rows" in sys.argv:
            # Output-row counts at both scales: an exact operator whose
            # ANSWER grows super-linearly on the dense replica (e.g.
            # the prefix-filter similarity join — 10 identical copies
            # of every doc make the true pair list quadratic) reads as
            # a high time exponent even when its cost per output row
            # is collapsing. Rows make that self-diagnosing.
            r1 = fn(spark, SRC).count()
            rk = fn(spark, DST).count()
            clear_memo()
            results[name]["rows_1x"] = r1
            results[name][f"rows_x{K}"] = rk
            if r1 and rk:
                results[name]["output_exponent"] = round(
                    math.log(rk / r1) / math.log(K), 3
                )
        print(name, results[name], file=sys.stderr)

    print(json.dumps({"k": K, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
