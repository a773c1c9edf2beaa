"""Physical-plan assertions: the scale properties the engine promises
(SURVEY.md §4, 'Optimize for scale' contract) must be visible in
explain output, not just assumed.

* predicate pushdown reaches the parquet scan (PushedFilters);
* column pruning reaches the scan (ReadSchema excludes unused cols);
* small-dimension joins broadcast (BroadcastHashJoin);
* aggregations run partial+final (map-side combine — the optimization
  the reference explicitly lacked, SURVEY.md §2.1 note 1);
* hot relational paths stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql.functions import col

from simplemapreduce_spark import catalog
from simplemapreduce_spark.sources.tables import load_table

catalog.load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = catalog.QUERIES["q6_forecast_revenue"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    # The shipdate range predicate must be pushed, not evaluated post-scan.
    assert "l_shipdate" in plan.split("PushedFilters:", 1)[1].split("\n", 1)[0] + plan.split(
        "PushedFilters:", 1
    )[1][:400]


def test_column_pruning(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(li)
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_small_dim_join_broadcasts(spark, sf_dir):
    df = catalog.QUERIES["q_join_broadcast"](spark, sf_dir)
    assert "BroadcastHashJoin" in _plan(df)


def test_q5_join_pipeline_broadcasts_dims(spark, sf_dir):
    plan = _plan(catalog.QUERIES["q5_local_supplier_volume"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_partial_aggregation(spark, sf_dir):
    df = catalog.QUERIES["q1_pricing_summary"](spark, sf_dir)
    plan = _plan(df)
    # partial + final hash aggregate pair = map-side combine.
    assert plan.count("HashAggregate") >= 2
    codegen = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    )
    assert "WholeStageCodegen subtrees" in codegen


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    plan = _plan(catalog.QUERIES["q_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """rn <= k over a window must run as WindowGroupLimit (per-group
    streaming top-k inside the sort) — not a full window + filter."""
    plan = _plan(catalog.QUERIES["q_topk_per_group"](spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_lateral_posexplode_stays_in_scan_stage(spark, sf_dir):
    """Generate (posexplode) must run pipelined with the scan — no
    exchange anywhere in the plan."""
    plan = _plan(catalog.QUERIES["q_lateral_posexplode"](spark, sf_dir))
    assert "Generate" in plan
    assert "Exchange" not in plan


def test_minhash_candidates_join_is_equi(spark, sf_dir):
    """The LSH candidate join must be a hash/sort-merge EQUI join on
    (band, band_hash) — never a nested-loop all-pairs product."""
    plan = _plan(catalog.QUERIES["q_dedup_minhash_lsh"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sim_bruteforce_broadcasts_queries(spark, sf_dir):
    """Brute-force ANN: the query set must broadcast; the corpus side
    must NOT shuffle (one pass over the big side)."""
    plan = _plan(catalog.QUERIES["q_sim_topk_bruteforce"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_domain_caps_uses_window_group_limit(spark, sf_dir):
    plan = _plan(catalog.QUERIES["q_domain_caps"](spark, sf_dir))
    assert "WindowGroupLimit" in plan  # per-partition top-k heap, no full sort


def test_subquery_in_rewrites_to_semi_join(spark, sf_dir):
    plan = _plan(catalog.QUERIES["q_subquery_in"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "Broadcast" in plan  # customer side is dimension-sized


def test_subquery_correlated_rewrites_to_aggregate_join(spark, sf_dir):
    """The correlated MAX must become agg-then-join, not per-row
    re-execution: exactly one scan-aggregate of orders feeding a join."""
    plan = _plan(catalog.QUERIES["q_subquery_correlated"](spark, sf_dir))
    assert "Join" in plan
    assert plan.count("Subquery") == 0  # fully decorrelated


def test_curation_ops_no_python_udf(spark, sf_dir):
    """Repetition/PII/chunking/packing must stay JVM-side (no
    BatchEvalPython / ArrowEvalPython stages)."""
    for name in ("q_text_repetition", "q_text_pii_redact", "q_text_chunks",
                 "q_domain_caps", "q_sample_stratified", "q_pack_token_budget"):
        plan = _plan(catalog.QUERIES[name](spark, sf_dir))
        assert "EvalPython" not in plan, name


def test_blocklist_is_broadcast_anti_join(spark, sf_dir):
    """Deny-list filtering must be a broadcast LEFT ANTI join — a
    map-side hash filter, zero shuffle of the corpus side."""
    plan = _plan(catalog.QUERIES["q_curation_blocklist"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark n-gram set is the small side and must broadcast;
    the corpus side must never be nested-loop joined."""
    plan = _plan(catalog.QUERIES["q_decontaminate_ngram"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    """Connected components must place both endpoints of every near-dup
    pair in the same component, and each component_id must be the min
    doc_id of its members (the deterministic keeper convention)."""
    pairs = catalog.QUERIES["q_dedup_minhash_lsh"](spark, sf_dir).collect()
    comp = catalog.QUERIES["q_dedup_clusters"](spark, sf_dir).collect()
    label = {r.doc_id: r.component_id for r in comp}
    for p in pairs:
        assert label[p.doc_a] == label[p.doc_b]
    members: dict[int, list[int]] = {}
    for r in comp:
        members.setdefault(r.component_id, []).append(r.doc_id)
    for cid, ids in members.items():
        assert cid == min(ids)
    sizes = {r.doc_id: r.component_size for r in comp}
    for cid, ids in members.items():
        for i in ids:
            assert sizes[i] == len(ids)


def test_new_curation_ops_no_python_udf(spark, sf_dir):
    """Mixture, histogram, and quantization must stay JVM-side."""
    for name in ("q_data_mixture", "q_length_histogram", "q_embedding_quantize"):
        plan = _plan(catalog.QUERIES[name](spark, sf_dir))
        assert "EvalPython" not in plan, name


def test_dedup_apply_partition_invariants(spark, sf_dir):
    """Survivors = representatives + unpaired docs; no cluster loses
    its representative and no component contributes more than one."""
    comp = catalog.QUERIES["q_dedup_clusters"](spark, sf_dir).collect()
    kept = {r.doc_id for r in catalog.QUERIES["q_dedup_apply"](spark, sf_dir).collect()}
    reps = {r.component_id for r in comp}
    losers = {r.doc_id for r in comp if r.doc_id != r.component_id}
    assert reps <= kept
    assert not (losers & kept)


def test_data_mixture_rates(spark, sf_dir):
    """Sampling never upsamples and realized counts track the rate."""
    rows = catalog.QUERIES["q_data_mixture"](spark, sf_dir).collect()
    for r in rows:
        assert 0 < r.target_rate <= 1.0
        assert r.n_sampled <= r.n_total
        # hash acceptance is binomial(n_total, rate); 5 sigma slack
        import math
        sigma = math.sqrt(r.n_total * r.target_rate * (1 - r.target_rate))
        assert abs(r.n_sampled - r.n_total * r.target_rate) <= 5 * sigma + 1


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """Both sides bucketed by the join key: the merge join AND the
    follow-up groupBy on that key must run without any Exchange."""
    df = catalog.QUERIES["q_join_bucketed"](spark, sf_dir)
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_shuffle_deterministic_is_topk(spark, sf_dir):
    """The epoch-shuffle head must compile to TakeOrderedAndProject
    (per-partition heaps), never a global sort materialization."""
    plan = _plan(catalog.QUERIES["q_shuffle_deterministic"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_python_datasource_partition_planning(spark, sf_dir):
    """The custom source must plan the requested number of input
    partitions (parallel read), not collapse to one task."""
    from simplemapreduce_spark.sources.pyds import register

    register(spark)
    df = spark.read.format("synthetic_docs").option("n", 100).option("partitions", 5).load()
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime bloom-filter injection: a selective filter on the dim
    side of a shuffle join gets compiled into a bloom filter applied to
    the fact scan side — rows that cannot match are dropped before the
    exchange. At 100 TB this is the difference between shuffling the
    whole fact table and shuffling the matching fraction."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    # Below the broadcast threshold the join would broadcast and no
    # bloom filter is needed — force the shuffle-join regime the
    # optimization targets. The application-side size gate defaults to
    # 10 GB (bloom cost only pays off on big scans); zero it so the
    # MB-scale fixture exercises the same mechanism.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = _plan(j)
        assert "bloom" in plan.lower(), plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: joining a partitioned fact scan on
    its partition column against a filtered dim prunes fact partitions
    at RUNTIME from the dim's build-side values — the partitioned-
    layout counterpart of static pruning, and the reason partition
    columns should be join keys at 100 TB."""
    dst = str(tmp_path / "li_by_flag")
    load_table(spark, sf_dir, "lineitem").limit(2000).write.partitionBy(
        "l_returnflag"
    ).mode("overwrite").parquet(dst)
    fact = spark.read.parquet(dst)
    dim = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag")
        .distinct()
        .filter(col("l_returnflag") == "R")
    )
    j = fact.join(dim, "l_returnflag").groupBy("l_returnflag").count()
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_sql_udf_inlines_no_python(spark, sf_dir):
    """CREATE FUNCTION ... RETURN <expr> must inline as a Catalyst
    expression: no Python evaluation node anywhere in the plan."""
    df = catalog.QUERIES["q_sql_udf"](spark, sf_dir)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_observe_metrics_match_aggregate(spark, sf_dir):
    """The observe() tap on q_observe_metrics must report exactly the
    rows/sum of the filtered input while the action runs."""
    from pyspark.sql import functions as F

    df = catalog.QUERIES["q_observe_metrics"](spark, sf_dir)
    rows = df.collect()
    listed = {}
    # Named observations surface through the execution listener only;
    # the string-named observe() is also queryable via the last query
    # execution's observedMetrics.
    qe = df._jdf.queryExecution()
    metrics = qe.observedMetrics()
    row = metrics.get("q_observe_metrics_tap").get()
    seen_rows, seen_price = row.getLong(0), row.getDecimal(1)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    want = o.select(
        F.count(F.lit(1)), F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
    ).first()
    assert seen_rows == want[0]
    assert str(seen_price) == str(want[1])
    assert sum(r.n for r in rows) == want[0]


def test_cumulative_distinct_single_shuffle(spark, sf_dir):
    """The running-distinct rewrite partitions both windows on user_id
    alone, so the physical plan must contain exactly ONE shuffle
    (one Exchange, two Sorts over it)."""
    plan = (
        catalog.QUERIES["q_window_cumulative_distinct"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_vocab_coverage_broadcasts_vocab(spark, sf_dir):
    """The K-row vocabulary must broadcast into the coverage join and
    the top-k must compile to TakeOrderedAndProject (no global sort)."""
    plan = _plan(catalog.QUERIES["q_text_vocab_coverage"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_snapshot_diff_single_join_no_cartesian(spark, sf_dir):
    import re

    plan = _plan(catalog.QUERIES["q_snapshot_diff"](spark, sf_dir))
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan
    join_nodes = set(
        re.findall(r"\((\d+)\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    )
    assert len(join_nodes) == 1, "snapshot diff must be exactly one equi-join"


def test_profile_columns_single_scan(spark, sf_dir):
    """The per-column profile must read the table once (one scan node),
    not once per column."""
    import re

    plan = _plan(catalog.QUERIES["q_profile_columns"](spark, sf_dir))
    scan_nodes = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scan_nodes) == 1


def test_dedup_lines_no_python_udf(spark, sf_dir):
    for name in ("q_dedup_lines", "q_dedup_lines_frequency"):
        plan = _plan(catalog.QUERIES[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_lateral_topn_decorrelates_to_group_limit(spark, sf_dir):
    """The correlated LATERAL LIMIT must rewrite to WindowGroupLimit
    with a Partial pass below the exchange (map-side top-k), never a
    per-row nested-loop re-execution."""
    import re

    plan = _plan(catalog.QUERIES["q_join_lateral_topn"](spark, sf_dir))
    # partial + final group-limit = two distinct WindowGroupLimit nodes
    nodes = set(re.findall(r"\((\d+)\) WindowGroupLimit", plan))
    assert len(nodes) >= 2, plan[:500]
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan


def test_market_basket_no_self_join(spark, sf_dir):
    """Pair candidates must come from row-local basket expansion (one
    Generate over collected baskets), not a quadratic self-join of the
    exploded order-part table."""
    import re

    plan = _plan(catalog.QUERIES["q_market_basket_pairs"](spark, sf_dir))
    assert "Generate" in plan
    assert "CartesianProduct" not in plan
    # the shared order-part subtree must be served from cache, not
    # re-scanned per branch
    assert "InMemoryTableScan" in plan


def test_nearest_centroid_broadcasts_prototypes(spark, sf_dir):
    plan = _plan(catalog.QUERIES["q_embedding_nearest_centroid"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_heavy_hitters_candidate_join_broadcasts(spark, sf_dir):
    """The exact verify pass must broadcast the (bounded) candidate
    set so the token stream is filtered before its groupBy — the
    property that bounds reduce-side state by |candidates|, not
    vocabulary."""
    df = catalog.QUERIES["q_heavy_hitters"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bitmap_distinct_no_expand(spark, sf_dir):
    """The bitmap formulation must not fall back to Catalyst's
    distinct Expand: both levels run as plain partial/final hash
    aggregates over mergeable bitmap state."""
    df = catalog.QUERIES["q_agg_bitmap_distinct"](spark, sf_dir)
    plan = _plan(df)
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final at both levels


def test_listagg_top3_uses_window_group_limit(spark, sf_dir):
    """The top-3 cut must run as WindowGroupLimit (per-partition top-k
    before the window shuffle), keeping the ordered aggregation's
    input bounded per group."""
    df = catalog.QUERIES["q_agg_listagg"](spark, sf_dir)
    assert "WindowGroupLimit" in _plan(df)


def test_zorder_layout_single_scan_no_shuffle_before_agg(spark, sf_dir):
    """The interleave is row-local codegen'd expression work: exactly
    one exchange (the final groupBy on zbucket), no Python."""
    df = catalog.QUERIES["q_layout_zorder"](spark, sf_dir)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    assert exec_plan.count("Exchange hashpartitioning") == 1, exec_plan


def test_semantic_dedup_assignment_is_broadcast(spark, sf_dir):
    """Cluster assignment must be the row-local broadcast argmin (a
    BroadcastNestedLoopJoin against the one-row centroid array), and
    the pairwise stage an equi-join on cell — never a corpus
    cross-join."""
    df = catalog.QUERIES["q_dedup_semantic"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan


def test_prefix_filter_join_no_cartesian(spark, sf_dir):
    """The PPJoin candidate stage must be an equi-join on prefix
    tokens (SortMergeJoin/ShuffledHashJoin on ptok) — never a
    cartesian pair enumeration; the verify stage is row-local
    array_intersect."""
    df = catalog.QUERIES["q_dedup_jaccard_prefix_filter"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_attribution_single_merged_stream_no_join(spark, sf_dir):
    """Touch->purchase attribution must resolve through ONE merged
    per-user window pass (union + running first/last ignore-nulls),
    not a per-purchase probe join against the touch history."""
    df = catalog.QUERIES["q_attribution_touch"](spark, sf_dir)
    plan = _plan(df)
    for marker in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                   "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, marker
    assert "Window" in plan


def test_revenue_contribution_dims_broadcast(spark, sf_dir):
    """The nation/customer dimensions must broadcast onto the
    lineitem-orders join; the Pareto window runs over the 25-row
    nation aggregate, never the raw scan."""
    df = catalog.QUERIES["q_revenue_contribution"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_skipgram_pairs_row_local_expansion(spark, sf_dir):
    """Skip-gram pairs must come from a row-local array transform
    (Generate/explode over each doc's own tokens) — no positional
    self-join of an exploded token table."""
    df = catalog.QUERIES["q_text_skipgram_pairs"](spark, sf_dir)
    plan = _plan(df)
    for marker in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert marker not in plan, marker
    assert "Generate" in plan


def test_bloom_filter_bit_set_broadcasts(spark, sf_dir):
    """The Bloom bit-set join must broadcast the (M-bounded) position
    table; the probe side never shuffles on position."""
    df = catalog.QUERIES["q_sketch_bloom_filter"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_gaps_islands_window_partitioned_by_user(spark, sf_dir):
    """The islands row-number window must partition by user (bounded
    per-partition work) — a partition-free global sort here would be
    the 100 TB anti-pattern."""
    df = catalog.QUERIES["q_ts_gaps_islands"](spark, sf_dir)
    plan = _plan(df)
    assert "Window" in plan
    # Assert on the partition spec itself — user_id appearing anywhere
    # in the Window operator's projected columns would pass even with
    # partitionBy dropped (ADVICE r3).
    assert "windowspecdefinition(user_id" in plan


def test_topp_mass_prunes_scan_and_shares_window_exchange(spark, sf_dir):
    """q_sample_topp_mass: the documents scan must read only
    (doc_id, source, n_chars) — never the text payload — and the
    cumulative + total windows plus the final groupBy all share the
    single hash-partitioning on source (one Exchange in the plan)."""
    df = catalog.QUERIES["q_sample_topp_mass"](spark, sf_dir)
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "text" not in read_schema, read_schema
    assert "n_chars" in read_schema
    assert plan.count("hashpartitioning(") == 1, plan


def test_kfold_is_single_aggregation_no_text_scan(spark, sf_dir):
    """q_split_kfold: fold membership is row-local hash math, so the
    whole plan is scan -> partial agg -> one Exchange -> final agg,
    reading only (doc_id, lang)."""
    df = catalog.QUERIES["q_split_kfold"](spark, sf_dir)
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "text" not in read_schema, read_schema
    assert plan.count("hashpartitioning(") == 1, plan


def test_ndcg_eval_broadcasts_query_side(spark, sf_dir):
    """q_sim_ndcg_eval: both retrieval passes must broadcast the small
    sampled query set over the corpus scan (BroadcastHashJoin /
    BroadcastNestedLoopJoin), never shuffle the corpus against it."""
    df = catalog.QUERIES["q_sim_ndcg_eval"](spark, sf_dir)
    plan = _plan(df)
    # Two corpus-vs-queries joins (exact + bucketed) plus the scalar
    # metric joins — every one carries a broadcast of the query side.
    # (The tiny gt/approx alignment joins may appear as SortMergeJoin
    # in the static plan; AQE converts them at runtime — the contract
    # here is that no CORPUS-sized side is ever shuffled against the
    # query set, i.e. the broadcast exchanges exist.)
    assert plan.count("BroadcastExchange") >= 2, plan


def test_dpp_join_prunes_fact_partitions(spark, sf_dir):
    """q_join_dpp's fact scan must carry a runtime dynamic-pruning
    subquery on the partition column (ship_month), i.e. the join
    result — not a static predicate — drives which month directories
    are read."""
    df = catalog.QUERIES["q_join_dpp"](spark, sf_dir)
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in exec_plan.lower(), exec_plan[:2000]
    assert "ship_month" in exec_plan


def test_bpe_train_scan_pruned_and_vocab_sized_argmax(spark, sf_dir):
    """q_text_bpe_train_merges: the documents scan must read ONLY the
    text column (training never touches doc metadata), and the
    per-round global argmax must compile to TakeOrderedAndProject over
    the pair aggregate — a top-1 heap, never a full global sort of the
    pair vocabulary."""
    df = catalog.QUERIES["q_text_bpe_train_merges"](spark, sf_dir)
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "text" in read_schema and "doc_id" not in read_schema, read_schema
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_classifier_single_aggregate_no_join(spark, sf_dir):
    """q_text_classifier_linear: model inference must be scan ->
    explode -> ONE hash aggregate — no join, no window, no Python
    stage (the hashed-weights trick's whole point)."""
    df = catalog.QUERIES["q_text_classifier_linear"](spark, sf_dir)
    plan = _plan(df)
    assert "Join" not in plan, plan[:800]
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "lang" not in read_schema and "source" not in read_schema, read_schema


def test_block_dedup_shuffles_checksum_not_payload(spark, sf_dir):
    """q_multimodal_block_dedup: the frequency-count exchange must
    carry the 16-byte checksum, never the block bytes — at 100 TB the
    difference IS the operator's feasibility."""
    df = catalog.QUERIES["q_multimodal_block_dedup"](spark, sf_dir)
    plan = _plan(df)
    keys = [
        seg.split("\n", 1)[0]
        for seg in plan.split("Arguments: hashpartitioning(")[1:]
    ]
    assert keys, plan[:500]
    # Every hash exchange keys on the derived checksum / media id —
    # never the block or payload bytes. (The round-robin exchange under
    # the scan is ensure_parallelism's fixture guard, not a key.)
    assert all(k.startswith(("chk", "media_id")) for k in keys), keys
    assert not any("payload" in k for k in keys), keys


def test_phrase_search_filters_postings_before_join(spark, sf_dir):
    """q_text_phrase_search: each join side must be filtered to ONE
    term's posting list before the position join (the pushed term
    predicate is what bounds the join at index scale)."""
    df = catalog.QUERIES["q_text_phrase_search"](spark, sf_dir)
    plan = _plan(df)
    from simplemapreduce_spark.plans.llm_text import PHRASE

    assert plan.count(PHRASE[0]) >= 1 and plan.count(PHRASE[1]) >= 1, plan[:800]
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_margin_mining_broadcasts_candidate_side(spark, sf_dir):
    """q_sim_margin_mining: the label-1 candidate slice rides a
    broadcast into the pair scoring (the big side streams), and the
    K-NN normalizers are window ranks, not self-joins."""
    df = catalog.QUERIES["q_sim_margin_mining"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan[:800]
    assert "windowspecdefinition(x" in plan and "windowspecdefinition(y" in plan, plan[:400]


def test_sql_hints_change_physical_plan(spark, sf_dir):
    """q_sql_join_hints: the BROADCAST hint must produce a
    BroadcastHashJoin and the REPARTITION hint an explicit
    hash-partitioning exchange on the hinted key — hints are only
    worth their surface if they demonstrably reach the physical
    plan."""
    df = catalog.QUERIES["q_sql_join_hints"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan[:600]
    assert "hashpartitioning(c_nationkey" in plan, plan[:600]
